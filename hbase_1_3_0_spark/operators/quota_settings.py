"""MasterQuotaManager quota-settings CRUD + operation-quota resolution.

Reference surface (hbase-1.3.0):

- ``Admin.setQuota(QuotaSettings)`` (hbase-client/.../client/Admin.java:1416)
  with settings built by ``QuotaSettingsFactory``
  (hbase-client/.../quotas/QuotaSettingsFactory.java:137 throttleUser,
  :175 unthrottleUser, :207 throttleTable, :229 throttleNamespace,
  :266 bypassGlobals). Scopes: user, user+table, user+namespace, table,
  namespace.
- ``MasterQuotaManager.setQuota`` (hbase-server/.../quotas/
  MasterQuotaManager.java:297): removeAll deletes the owner row;
  otherwise fetch -> applyThrottle (:389) / applyBypassGlobals (:454)
  -> delete-if-empty. ``applyThrottle``: a typed request with a limit
  upserts that component (limit < 1 rejected, :462 validateTimedQuota);
  a typed request with NO limit clears just that component; an untyped
  request (unthrottleX) clears the whole throttle. The 1.3.0 code has a
  quirk replicated here on purpose: clearing READ_NUMBER clears ReqNum,
  not ReadNum (MasterQuotaManager.java:431-437 — the READ_NUMBER case's
  else-branch calls ``throttle.clearReqNum()``).
- ``QuotaRetriever`` / ``QuotaFilter`` (hbase-client/.../quotas/
  QuotaRetriever.java, QuotaFilter.java): scan the settings store with
  regex filters on user/table/namespace and a type filter.
- Resolution for an operation (RegionServerQuotaManager.java:85
  ``getQuota``): the USER limiter is the most specific scope that has
  ANY throttle for that user — user+table, else user+namespace, else
  user-global (UserQuotaState.java:184 getTableLimiter). With
  ``bypassGlobals`` the user limiter alone applies (table/namespace
  limiters are never consulted); otherwise the chain is user, table,
  namespace, and the op is a quota noop iff every limiter in the chain
  is bypass.

Spark posture: the settings store is master metadata (the
replication-peer-registry pattern, ``catalog.py``) — a dict with JSON
persistence, never a distributed dataset. ``resolve_operation_quota``
is the analytic surface: the per-scope limiter tables are tiny
conditional aggregations broadcast onto the request stream, so the
(user x table) resolution is shuffle-free on the request side at any
scale. Stored settings feed the enforcement replays in
``operators/quota.py`` via :meth:`MasterQuotaManager.replay_limits`.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from pathlib import Path
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "QuotaSettings",
    "MasterQuotaManager",
    "THROTTLE_TYPES",
    "TIME_UNIT_MS",
    "throttle_user",
    "unthrottle_user",
    "throttle_table",
    "unthrottle_table",
    "throttle_namespace",
    "unthrottle_namespace",
    "bypass_globals",
    "resolve_operation_quota",
]

#: ThrottleType.java values -> the LIMITER_KINDS key used by the
#: enforcement replays in operators/quota.py
THROTTLE_TYPES = {
    "REQUEST_NUMBER": "req_num",
    "REQUEST_SIZE": "req_size",
    "WRITE_NUMBER": "write_num",
    "WRITE_SIZE": "write_size",
    "READ_NUMBER": "read_num",
    "READ_SIZE": "read_size",
}

#: java.util.concurrent.TimeUnit values ThrottleSettings accepts
TIME_UNIT_MS = {
    "SECONDS": 1_000,
    "MINUTES": 60_000,
    "HOURS": 3_600_000,
    "DAYS": 86_400_000,
}


@dataclass(frozen=True)
class QuotaSettings:
    """One setQuota request (QuotaSettings + SetQuotaRequest analog).

    ``throttle_type=None`` with ``quota_type='THROTTLE'`` is the
    unthrottleX form (clears the whole throttle). ``soft_limit=None``
    with a type clears that single component.
    """

    user: str | None = None
    table: str | None = None
    namespace: str | None = None
    quota_type: str = "THROTTLE"  # THROTTLE | GLOBAL_BYPASS
    throttle_type: str | None = None
    soft_limit: int | None = None
    time_unit: str | None = None
    bypass: bool = False
    remove_all: bool = False

    def __post_init__(self):
        if self.table is not None and self.namespace is not None:
            # QuotaSettings.java: a settings object carries at most one
            # of table/namespace alongside the optional user
            raise ValueError("table and namespace are mutually exclusive")
        if self.quota_type == "THROTTLE" and self.throttle_type is not None:
            if self.throttle_type not in THROTTLE_TYPES:
                raise ValueError(
                    f"invalid throttle type: {self.throttle_type}"
                )
            if self.soft_limit is not None and self.time_unit not in (
                TIME_UNIT_MS
            ):
                raise ValueError(f"invalid time unit: {self.time_unit}")


def throttle_user(
    user: str,
    throttle_type: str,
    soft_limit: int,
    time_unit: str,
    *,
    table: str | None = None,
    namespace: str | None = None,
) -> QuotaSettings:
    """QuotaSettingsFactory.throttleUser (:137/:151/:165)."""
    return QuotaSettings(
        user=user, table=table, namespace=namespace,
        throttle_type=throttle_type, soft_limit=soft_limit,
        time_unit=time_unit,
    )


def unthrottle_user(
    user: str,
    *,
    table: str | None = None,
    namespace: str | None = None,
) -> QuotaSettings:
    """QuotaSettingsFactory.unthrottleUser (:175/:185/:195) — the
    untyped throttle request that clears every component at the scope."""
    return QuotaSettings(user=user, table=table, namespace=namespace)


def throttle_table(
    table: str, throttle_type: str, soft_limit: int, time_unit: str
) -> QuotaSettings:
    """QuotaSettingsFactory.throttleTable (:207)."""
    return QuotaSettings(
        table=table, throttle_type=throttle_type, soft_limit=soft_limit,
        time_unit=time_unit,
    )


def unthrottle_table(table: str) -> QuotaSettings:
    return QuotaSettings(table=table)


def throttle_namespace(
    namespace: str, throttle_type: str, soft_limit: int, time_unit: str
) -> QuotaSettings:
    """QuotaSettingsFactory.throttleNamespace (:229)."""
    return QuotaSettings(
        namespace=namespace, throttle_type=throttle_type,
        soft_limit=soft_limit, time_unit=time_unit,
    )


def unthrottle_namespace(namespace: str) -> QuotaSettings:
    return QuotaSettings(namespace=namespace)


def bypass_globals(user: str, on: bool) -> QuotaSettings:
    """QuotaSettingsFactory.bypassGlobals (:266) — user-global only."""
    return QuotaSettings(user=user, quota_type="GLOBAL_BYPASS", bypass=on)


def remove_quota(
    user: str | None = None,
    table: str | None = None,
    namespace: str | None = None,
) -> QuotaSettings:
    """The SetQuotaRequest removeAll form — drop the owner row whole."""
    return QuotaSettings(
        user=user, table=table, namespace=namespace, remove_all=True
    )


class MasterQuotaManager:
    """The settings store MasterQuotaManager keeps in the hbase:quota
    table — here a JSON-persistable dict keyed by (user, table,
    namespace), each row ``{"throttle": {TYPE: [limit, unit]},
    "bypass_globals": bool}`` (the Quotas protobuf analog)."""

    def __init__(self, path: str | Path | None = None) -> None:
        self._quotas: dict[tuple[str, str, str], dict] = {}
        self._path = Path(path) if path else None
        if self._path and self._path.exists():
            self._load()

    # -- CRUD (MasterQuotaManager.java:95 setQuota dispatch) ---------------
    def set_quota(self, settings: QuotaSettings) -> None:
        key = (settings.user or "", settings.table or "",
               settings.namespace or "")
        if key == ("", "", ""):
            raise ValueError("a quota needs a user, table, or namespace")
        if settings.remove_all:
            self._quotas.pop(key, None)
            self._persist()
            return
        row = self._quotas.get(key) or {"throttle": {}, "bypass_globals": False}
        row = {"throttle": dict(row["throttle"]),
               "bypass_globals": row["bypass_globals"]}
        if settings.quota_type == "GLOBAL_BYPASS":
            if settings.table or settings.namespace:
                raise ValueError("bypassGlobals is a user-global setting")
            row["bypass_globals"] = bool(settings.bypass)
        else:
            self._apply_throttle(row, settings)
        if not row["throttle"] and not row["bypass_globals"]:
            self._quotas.pop(key, None)  # delete-if-empty (:316)
        else:
            self._quotas[key] = row
        self._persist()

    def _apply_throttle(self, row: dict, s: QuotaSettings) -> None:
        """applyThrottle (MasterQuotaManager.java:389)."""
        if s.throttle_type is None:
            row["throttle"] = {}  # clearThrottle (:450)
            return
        if s.soft_limit is not None:
            if int(s.soft_limit) < 1:
                # validateTimedQuota (:462)
                raise ValueError(
                    "The throttle limit must be greater then 0, got "
                    f"{s.soft_limit}"
                )
            row["throttle"][s.throttle_type] = [
                int(s.soft_limit), s.time_unit,
            ]
        elif s.throttle_type == "READ_NUMBER":
            # the 1.3.0 quirk (:431-437): READ_NUMBER's clear branch
            # calls clearReqNum() — replicated deliberately for parity
            row["throttle"].pop("REQUEST_NUMBER", None)
        else:
            row["throttle"].pop(s.throttle_type, None)

    # -- QuotaRetriever / QuotaFilter ---------------------------------------
    def list_quotas(
        self,
        *,
        user_regex: str | None = None,
        table_regex: str | None = None,
        namespace_regex: str | None = None,
        types: Iterable[str] | None = None,
    ) -> list[dict]:
        """Flat ThrottleSettings-shaped rows (one per throttle component,
        plus one GLOBAL_BYPASS row per bypassing user), filtered with the
        EXACT QuotaRetriever scan semantics (QuotaTableUtil.makeFilter
        :155, decision-tabled against TestQuotaAdmin.java:149
        testQuotaRetrieverFilter):

        - a USER filter selects user-owned rows; combined with table
          and/or namespace filters it keeps the user rows whose table OR
          namespace matches (MUST_PASS_ONE union, :158-180 — user-global
          rows drop out once either sub-filter is present);
        - with NO user filter, a table filter selects TABLE-scope rows
          only, else a namespace filter selects NAMESPACE-scope rows
          only (the :187-193 else-if chain — table wins when both are
          set, and user-owned rows never match these row-key regexes).

        Regexes are anchored (RegexStringComparator over the full
        rowkey component: "User" does not match "User0")."""
        import re

        def m(pat, val):
            return bool(val) and re.fullmatch(pat, val) is not None

        def keep(user, table, ns) -> bool:
            if user_regex is not None:
                if not m(user_regex, user):
                    return False
                if table_regex is None and namespace_regex is None:
                    return True
                return (
                    (table_regex is not None and m(table_regex, table))
                    or (namespace_regex is not None
                        and m(namespace_regex, ns))
                )
            if table_regex is not None:
                return not user and m(table_regex, table)
            if namespace_regex is not None:
                return not user and m(namespace_regex, ns)
            return True

        tset = set(types) if types is not None else None
        out = []
        for (user, table, ns), row in sorted(self._quotas.items()):
            if not keep(user, table, ns):
                continue
            for ttype, (limit, unit) in sorted(row["throttle"].items()):
                if tset is not None and "THROTTLE" not in tset:
                    continue
                out.append({
                    "user": user or None, "table": table or None,
                    "namespace": ns or None, "quota_type": "THROTTLE",
                    "throttle_type": ttype, "soft_limit": limit,
                    "time_unit": unit,
                })
            if row["bypass_globals"] and (
                tset is None or "GLOBAL_BYPASS" in tset
            ):
                out.append({
                    "user": user or None, "table": None, "namespace": None,
                    "quota_type": "GLOBAL_BYPASS", "throttle_type": None,
                    "soft_limit": None, "time_unit": None,
                })
        return out

    # -- Spark surfaces ------------------------------------------------------
    def settings_df(self, spark: SparkSession) -> DataFrame:
        """The store as a DataFrame — one row per throttle component
        plus one per bypass flag. Metadata-scale; callers broadcast it."""
        rows = []
        for (user, table, ns), row in sorted(self._quotas.items()):
            for ttype, (limit, unit) in sorted(row["throttle"].items()):
                rows.append((user or None, table or None, ns or None,
                             "THROTTLE", ttype, limit, unit,
                             TIME_UNIT_MS[unit], False))
            if row["bypass_globals"]:
                rows.append((user or None, None, None, "GLOBAL_BYPASS",
                             None, None, None, None, True))
        schema = (
            "q_user string, q_table string, q_namespace string, "
            "quota_type string, throttle_type string, soft_limit long, "
            "time_unit string, tunit_ms long, bypass_globals boolean"
        )
        return spark.createDataFrame(rows, schema)

    def replay_limits(self) -> list:
        """Stored settings as the ``limits`` list
        :func:`hbase_1_3_0_spark.operators.quota.check_quota_replay`
        consumes: (scope, key, kind, limit, tunit_ms). The composed
        replay keys user limiters per user (the reference's shared
        UserQuotaState global limiter); per-(user,table) overrides are
        a resolution-time concern (:func:`resolve_operation_quota`)."""
        limits = []
        for (user, table, ns), row in sorted(self._quotas.items()):
            if user and not table and not ns:
                scope, key = "user", user
            elif table and not user:
                scope, key = "table", table
            elif ns and not user:
                scope, key = "namespace", ns
            else:
                continue  # scoped user overrides: resolution-time only
            for ttype, (limit, unit) in sorted(row["throttle"].items()):
                limits.append(
                    (scope, key, THROTTLE_TYPES[ttype], limit,
                     TIME_UNIT_MS[unit])
                )
        return limits

    # -- persistence (the replication-peer-registry pattern) ---------------
    # Keys are stored as JSON arrays (a JSON string per dict key), so a
    # user/table/namespace name containing any delimiter character
    # round-trips losslessly; the legacy "a|b|c" form is still readable.
    def _persist(self) -> None:
        if not self._path:
            return
        payload = {
            json.dumps(list(k)): v for k, v in sorted(self._quotas.items())
        }
        self._path.write_text(json.dumps(payload, indent=2))

    def _load(self) -> None:
        payload = json.loads(self._path.read_text())
        quotas: dict[tuple[str, str, str], dict] = {}
        for k, v in payload.items():
            parts = None
            if k.startswith("["):
                # r10+ JSON-array keys; a pre-r10 pipe-joined key whose
                # first segment happens to start with '[' (a user named
                # '[admin', say) is not valid JSON — fall through to the
                # pipe split rather than raising.
                try:
                    parts = json.loads(k)
                except json.JSONDecodeError:
                    parts = None
            if parts is None:  # pre-r10 pipe-joined files
                parts = k.split("|")
            if len(parts) != 3:
                raise ValueError(f"corrupt quota key {k!r}")
            quotas[tuple(parts)] = v
        self._quotas = quotas


def resolve_operation_quota(
    requests: DataFrame,
    settings: DataFrame,
    *,
    user_col: str = "user",
    table_col: str = "table_name",
    ns_col: str = "namespace",
) -> DataFrame:
    """RegionServerQuotaManager.getQuota (:85) as a broadcast-join plan.

    ``requests``: one row per (user, table, namespace) operation
    context. ``settings``: :meth:`MasterQuotaManager.settings_df`.
    Output adds:

    - ``user_scope``: which user limiter getTableLimiter resolves —
      'table' | 'namespace' | 'global' | 'none' (UserQuotaState.java:184:
      the FIRST scope with ANY throttle component wins the whole
      limiter; precedence is scope-level, never per-component).
    - ``user_req_num``: the resolved user limiter's REQUEST_NUMBER soft
      limit (NULL if that limiter has no req-num component).
    - ``table_req_num`` / ``ns_req_num``: the table and namespace
      limiters' REQUEST_NUMBER limits — NULL under ``bypass_globals``
      (the reference never consults them then,
      RegionServerQuotaManager.java:92-97).
    - ``bypass_globals``, and ``noop``: true iff the op runs quota-free
      (every consulted limiter is bypass, :98-107 useNoop).

    Every join side built from ``settings`` is a per-scope conditional
    aggregation of metadata — explicitly broadcast, so the request
    stream never shuffles regardless of its size.
    """
    req = requests.withColumnRenamed(user_col, "user") \
        .withColumnRenamed(table_col, "table_name") \
        .withColumnRenamed(ns_col, "namespace")

    thr = settings.where(F.col("quota_type") == "THROTTLE")

    def scope_agg(df, keys, prefix):
        # key columns renamed per prefix so the six derivations of one
        # settings frame join unambiguously (Spark self-join lineage)
        agg = df.groupBy(*keys).agg(
            F.max(
                F.when(
                    F.col("throttle_type") == "REQUEST_NUMBER",
                    F.col("soft_limit"),
                )
            ).alias(f"{prefix}_req_num"),
            F.lit(True).alias(f"{prefix}_has"),
        )
        for i, k in enumerate(keys):
            agg = agg.withColumnRenamed(k, f"{prefix}_k{i}")
        return F.broadcast(agg)

    ut = scope_agg(
        thr.where(F.col("q_user").isNotNull()
                  & F.col("q_table").isNotNull()),
        ["q_user", "q_table"], "ut",
    )
    un = scope_agg(
        thr.where(F.col("q_user").isNotNull()
                  & F.col("q_namespace").isNotNull()),
        ["q_user", "q_namespace"], "un",
    )
    ug = scope_agg(
        thr.where(F.col("q_user").isNotNull()
                  & F.col("q_table").isNull()
                  & F.col("q_namespace").isNull()),
        ["q_user"], "ug",
    )
    tq = scope_agg(
        thr.where(F.col("q_table").isNotNull() & F.col("q_user").isNull()),
        ["q_table"], "tq",
    )
    nq = scope_agg(
        thr.where(F.col("q_namespace").isNotNull()
                  & F.col("q_user").isNull()),
        ["q_namespace"], "nq",
    )
    byp = F.broadcast(
        settings.where(
            (F.col("quota_type") == "GLOBAL_BYPASS")
            & F.col("bypass_globals")
        ).select(F.col("q_user").alias("b_user")).distinct()
    )

    j = (
        req
        .join(ut, (F.col("user") == F.col("ut_k0"))
              & (F.col("table_name") == F.col("ut_k1")), "left")
        .join(un, (F.col("user") == F.col("un_k0"))
              & (F.col("namespace") == F.col("un_k1")), "left")
        .join(ug, F.col("user") == F.col("ug_k0"), "left")
        .join(tq, F.col("table_name") == F.col("tq_k0"), "left")
        .join(nq, F.col("namespace") == F.col("nq_k0"), "left")
        .join(byp, F.col("user") == F.col("b_user"), "left")
    )

    has = lambda p: F.coalesce(F.col(f"{p}_has"), F.lit(False))  # noqa: E731
    user_scope = (
        F.when(has("ut"), F.lit("table"))
        .when(has("un"), F.lit("namespace"))
        .when(has("ug"), F.lit("global"))
        .otherwise(F.lit("none"))
    )
    user_req_num = (
        F.when(has("ut"), F.col("ut_req_num"))
        .when(has("un"), F.col("un_req_num"))
        .when(has("ug"), F.col("ug_req_num"))
    )
    bypass = F.col("b_user").isNotNull()
    noop = (user_scope == "none") & (
        bypass | (~has("tq") & ~has("nq"))
    )
    return j.select(
        "user", "table_name", "namespace",
        user_scope.alias("user_scope"),
        user_req_num.cast("long").alias("user_req_num"),
        F.when(~bypass, F.col("tq_req_num")).cast("long")
         .alias("table_req_num"),
        F.when(~bypass, F.col("nq_req_num")).cast("long")
         .alias("ns_req_num"),
        bypass.alias("bypass_globals"),
        noop.alias("noop"),
    )
