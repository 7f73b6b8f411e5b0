"""URL / domain operators for web-scale training-data pipelines.

The CCNet/RefinedWeb/Dolma-style web curation steps that act on a
document's source URL rather than its text: parse, canonicalize (strip
tracking params and fragments), URL-level dedup, per-domain statistics,
and domain block/allow filtering with subdomain suffix matching.

All pure JVM Column expressions (``parse_url``, split/filter/array ops) —
no Python on the data path. Domain lists are human-curated vocabularies
(thousands, not millions): they broadcast as literal arrays and each
URL's membership test is a bounded suffix scan, so the 100 TB corpus is
never shuffled for filtering; per-domain stats are one hash aggregation
keyed on the (low-cardinality) registered domain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Query parameters that carry click-tracking state, not content identity
#: (the standard canonicalization drop-list). ``utm_`` matches as a key
#: PREFIX (utm_source, utm_id, ...); the rest match the key EXACTLY —
#: a prefix match on 'ref' would wrongly strip content-identifying
#: params like refid/refresh/referrer.
TRACKING_PREFIXES = ("utm_",)
TRACKING_KEYS = ("fbclid", "gclid", "msclkid", "ref", "mc_eid")

#: Second-level labels that act as public suffixes under a 2-letter ccTLD
#: ("example.co.uk" -> registered domain is the 3rd label). A pragmatic
#: subset of the Public Suffix List; callers with the full PSL can pass
#: their own set.
_SECOND_LEVEL_SUFFIXES = ("co", "com", "net", "org", "gov", "ac", "edu")


def _part(url: Column, part: str) -> Column:
    """One URL component via ``try_parse_url`` — NULL on malformed input.

    Under Spark 4 (ANSI on by default) plain ``parse_url`` throws
    INVALID_URL on the first malformed URL and aborts the whole job; a
    web-crawl corpus is guaranteed to contain malformed URLs, so every
    extractor here is null-tolerant. Policy for null-parse rows: they are
    carried as NULL host/domain/canonical and callers quarantine them
    with :func:`quarantine_urls` (same posture as sources/jsonl.py's
    PERMISSIVE corrupt-row quarantine)."""
    return F.try_parse_url(url, F.lit(part))


def host_of(url: Column) -> Column:
    """Lowercased host part of a URL (no port); NULL if unparseable."""
    return F.lower(_part(url, "HOST"))


def registered_domain(
    host: Column,
    second_level: tuple[str, ...] = _SECOND_LEVEL_SUFFIXES,
) -> Column:
    """The registrable domain of a host: last two labels, or last three
    when the second-to-last is a public second-level suffix under a
    2-letter ccTLD (``a.b.example.co.uk`` -> ``example.co.uk``)."""
    labels = F.split(host, "\\.")
    n = F.size(labels)
    second = F.element_at(labels, -2)
    last = F.element_at(labels, -1)
    take3 = (
        (n >= 3)
        & (F.length(last) == 2)
        & second.isin(*second_level)
    )
    tail = F.when(take3, F.slice(labels, n - 2, 3)).otherwise(
        F.when(n >= 2, F.slice(labels, n - 1, 2)).otherwise(labels)
    )
    return F.array_join(tail, ".")


def canonicalize_url(url: Column) -> Column:
    """Canonical form for URL-identity dedup: lowercase scheme+host, drop
    the fragment, drop tracking query params (sorted survivors), strip a
    trailing slash from the path. A non-default explicit port is KEPT
    (http://h:8080/x and http://h/x are distinct origins, not dups);
    the scheme-default port (http:80, https:443) is normalized away so
    explicit-default and implicit forms collapse. NULL (quarantine
    candidate) when the URL has no parseable scheme or host."""
    scheme = F.lower(_part(url, "PROTOCOL"))
    host = host_of(url)
    # parse_url has no PORT key — the port is the trailing :digits of the
    # AUTHORITY ('user@h.com:8080' -> 8080); absent -> empty match -> NULL
    port = F.nullif(
        F.regexp_extract(
            F.coalesce(_part(url, "AUTHORITY"), F.lit("")), ":(\\d+)$", 1
        ),
        F.lit(""),
    ).try_cast("int")
    default_port = (
        ((scheme == "http") & (port == 80))
        | ((scheme == "https") & (port == 443))
    )
    port_part = F.when(
        port.isNotNull() & ~default_port,
        F.concat(F.lit(":"), port.cast("string")),
    ).otherwise(F.lit(""))
    path = F.regexp_replace(
        F.coalesce(_part(url, "PATH"), F.lit("")), "/$", ""
    )
    query = F.coalesce(_part(url, "QUERY"), F.lit(""))

    def is_tracking(kv: Column) -> Column:
        key = F.substring_index(kv, "=", 1)
        by_prefix = F.exists(
            F.array(*[F.lit(p) for p in TRACKING_PREFIXES]),
            lambda p: key.startswith(p),
        )
        return by_prefix | key.isin(*TRACKING_KEYS)
    kept = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda kv: (F.length(kv) > 0) & ~is_tracking(kv),
            )
        ),
        "&",
    )
    # concat is null-propagating: a NULL scheme or host (malformed URL)
    # makes the whole canonical form NULL — the quarantine marker
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        port_part,
        path,
        F.when(F.length(kept) > 0, F.concat(F.lit("?"), kept)).otherwise(
            F.lit("")
        ),
    )


def parse_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Structured URL columns: scheme, host, registered domain, path,
    canonical form. Malformed URLs produce NULL components (never a job
    abort) — route them through :func:`quarantine_urls`."""
    u = F.col(url_col)
    host = host_of(u)
    return df.withColumns(
        {
            "scheme": F.lower(_part(u, "PROTOCOL")),
            "host": host,
            "domain": F.when(host.isNotNull(), registered_domain(host)),
            "path": _part(u, "PATH"),
            "canonical_url": canonicalize_url(u),
        }
    )


def quarantine_urls(
    df: DataFrame, url_col: str = "url"
) -> tuple[DataFrame, DataFrame]:
    """Split a crawl frame into (clean, quarantined) on URL parseability —
    the explicit malformed-URL policy (mirrors sources/jsonl.py's
    corrupt-row quarantine): ``clean`` rows have a parseable scheme+host,
    ``quarantined`` rows don't and should be audited, not silently
    joined into dedup/stats keyed on NULL."""
    u = F.col(url_col)
    ok = F.lower(_part(u, "PROTOCOL")).isNotNull() & host_of(u).isNotNull()
    return df.where(ok), df.where(~ok | u.isNull())


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the smallest id per canonical URL. Groups on the md5 of the
    canonical form (32-hex shuffle keys, not URL bodies — same rationale
    as exact_dedup). Malformed URLs (NULL canonical) have no URL
    identity, so each survives as its own row (dup_count=1) instead of
    all collapsing into one NULL group — quarantine them upstream with
    :func:`quarantine_urls` if they shouldn't pass at all."""
    canon = df.select(
        F.col(id_col), canonicalize_url(F.col(url_col)).alias("_canon")
    )
    deduped = (
        canon.where(F.col("_canon").isNotNull())
        .groupBy(F.md5(F.col("_canon")).alias("_h"))
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("dup_count"),
        )
        .select(id_col, "dup_count")
    )
    unparseable = canon.where(F.col("_canon").isNull()).select(
        F.col(id_col), F.lit(1).cast("long").alias("dup_count")
    )
    return deduped.unionByName(unparseable)


def domain_stats(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Per registered domain: document count, distinct host count — the
    curation dashboard / blocklist-candidate aggregation. One hash agg
    keyed on the registered domain. Malformed URLs aggregate under a
    NULL domain — one visible audit row, not a job abort."""
    host = host_of(F.col(url_col))
    return (
        df.select(
            F.when(host.isNotNull(), registered_domain(host)).alias(
                "domain"
            ),
            host.alias("_host"),
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("_host").alias("n_hosts"),
        )
    )


def domain_filter(
    df: DataFrame,
    domains: tuple[str, ...] | list[str],
    *,
    url_col: str = "url",
    mode: str = "block",
) -> DataFrame:
    """Block- or allow-list filtering by domain with subdomain matching:
    a listed ``example.com`` matches host ``example.com`` and any
    ``*.example.com``. The list broadcasts as a literal array; each host
    does one bounded suffix scan — no join, no shuffle.

    Malformed URLs (NULL host) count as NOT listed: a blocklist keeps
    them, an allowlist drops them (an unparseable URL can't prove
    membership). Quarantine first via :func:`quarantine_urls` when
    malformed rows need separate handling."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    host = host_of(F.col(url_col))
    dom_arr = F.array(*[F.lit(d.lower()) for d in domains])
    listed = F.coalesce(
        F.exists(
            dom_arr,
            lambda d: (host == d) | host.endswith(F.concat(F.lit("."), d)),
        ),
        F.lit(False),
    )
    return df.where(~listed if mode == "block" else listed)
