"""Dtype-drift lint for every ``oracle_sql()`` entry — the check the
fetchall-based local gate provably cannot perform.

Three driver reds (r06, r07, r08) shared one signature: the pair passes
locally (``tools/check_oracles.py`` fetches via ``fetchall``, which
converts DuckDB HUGEINT/int128 to Python int losslessly) but
hash-mismatches at the driver, whose harness fetches via Arrow.  Under
Arrow, DuckDB ``sum()`` over integers surfaces as ``decimal128(38, 0)``
(HUGEINT), which pandas renders as dtype ``object`` — value-identical,
hash-different.  The repo convention is to cast every integer-valued
final column ``::BIGINT`` (84+ sites); this lint makes the convention
machine-checked so the failure family is dead, not just the instance.

For each SQL oracle it executes the query at sf0.001 (cheap) and fetches
the result AS ARROW, then fails on:

* any ``decimal128(38, 0)`` column — the HUGEINT signature (an uncast
  ``sum``/``product`` over integers in the final select);
* any null-typed column (a literal NULL without a cast);
* any pandas ``object`` dtype that is not plain str/bytes — the generic
  "this will hash differently on the driver" smell (Decimal, mixed).

Intentional decimals (e.g. the BigDecimal ColumnInterpreter queries) are
fine: they carry an explicit non-(38,0) precision/scale from a CAST, so
they don't match the HUGEINT signature.

Usage: python tools/lint_oracles.py [sf_dir] [query ...]
Exit 1 on any finding.  Run it whenever an oracle changes; the verify
skill runs it before freezing a round.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

#: arrow types that hash identically between fetchall and arrow paths
_SAFE_TYPES = (
    pa.types.is_integer,
    pa.types.is_floating,
    pa.types.is_boolean,
    pa.types.is_string,
    pa.types.is_large_string,
    pa.types.is_binary,
    pa.types.is_large_binary,
    pa.types.is_date,
    pa.types.is_timestamp,
    pa.types.is_list,
    pa.types.is_large_list,
)


def _type_problems(t: pa.DataType) -> str | None:
    if pa.types.is_decimal(t):
        if t.precision == 38 and t.scale == 0:
            return (
                "HUGEINT (decimal128(38,0)) — uncast integer aggregate; "
                "add ::BIGINT in the final select"
            )
        # explicit decimals (CAST(... AS DECIMAL(p,s))) are a deliberate
        # contract (BigDecimal interpreter queries) — allow them.
        return None
    if pa.types.is_null(t):
        return "null-typed column — bare NULL literal needs a cast"
    # a list(decimal128(38,0)) — e.g. list(sum(...)) — hash-drifts just
    # like a bare HUGEINT column; recurse into the element type.
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        inner = _type_problems(t.value_type)
        return f"list element: {inner}" if inner else None
    for ok in _SAFE_TYPES:
        if ok(t):
            return None
    return f"non-standard arrow type {t} — verify driver hash stability"


def _column_problems(field: pa.Field) -> str | None:
    return _type_problems(field.type)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.001"
    names: list[str] = []
    for a in args:
        if "/" in a or a.startswith("sf"):
            sf_dir = a
        else:
            names.append(a)

    oracles = entrymod.oracle_sql()
    if names:
        oracles = {k: v for k, v in oracles.items() if k in names}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    findings: list[str] = []
    for name, sql in sorted(oracles.items()):
        try:
            tbl = con.execute(sql).arrow()
        except Exception as e:  # noqa: BLE001
            findings.append(f"{name}: duckdb error under arrow fetch: {e}")
            continue
        bad = []
        for field in tbl.schema:
            msg = _column_problems(field)
            if msg:
                bad.append(f"col {field.name}: {msg}")
        if bad:
            findings.append(f"{name}: " + "; ".join(bad))
        else:
            print(f"ok   {name} ({tbl.num_rows} rows)")

    if findings:
        print(f"\n{len(findings)} dtype-drift findings:")
        for f in findings:
            print(f"FAIL {f}")
        return 1
    print(f"\nall {len(oracles)} oracles arrow-clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
