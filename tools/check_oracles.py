"""Local approximation of the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` side-by-side at a given SF and
compare row count, column names, and (order-insensitive) values.

Usage: python tools/check_oracles.py [--json OUT.json]
           [--changed-since GITREF] [sf_dir] [query ...]

With ``--json`` a driver-format report ({name: {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}}) is written for ALL checked
queries — committed per round as CORRECTNESS_LOCAL_r{N}.json so the full
declared-query inventory (175 as of r10) has a recorded verdict even
though the driver's own gate stops at the first 50 ``queries()`` keys.

``--changed-since GITREF`` selects only the queries affected by the diff
since GITREF (working tree included): queries whose ``q_*`` function or
oracle entry appears in changed ``__spark_entry__.py`` hunks, plus every
query whose function source references a changed ``hbase_1_3_0_spark``
module or any module that transitively imports one. The full ~16-min run
stays the per-round gate; this mode is the cheap pre-rotation pass for
late-round additions (the mechanism VERDICT r06 asked for after
substring_dedup's env sensitivity reached the driver unexercised).
Over-approximates on purpose; explicit query args further intersect it.
"""

from __future__ import annotations

import ast as pyast
import inspect
import json
import math
import re
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from hbase_1_3_0_spark.engine import build_session  # noqa: E402
from tools.pymodels import PY_MODELS  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, bytes):
        return v.hex()
    return v


def row_key(row, cols):
    return tuple(normalize(row[c]) for c in cols)


REPO = Path(__file__).resolve().parent.parent
PKG = "hbase_1_3_0_spark"


def _module_imports(path: Path) -> set[str]:
    """Repo-internal module basenames imported by ``path`` (ast-parsed)."""
    out: set[str] = set()
    try:
        tree = pyast.parse(path.read_text())
    except SyntaxError:
        return out
    for node in pyast.walk(tree):
        if isinstance(node, pyast.ImportFrom) and node.module:
            if node.module.startswith(PKG):
                tail = node.module.rsplit(".", 1)[-1]
                out.add(tail)
                for a in node.names:
                    out.add(a.name)
        elif isinstance(node, pyast.Import):
            for a in node.names:
                if a.name.startswith(PKG):
                    out.add(a.name.rsplit(".", 1)[-1])
    return out


def changed_queries(gitref: str, qs: dict) -> set[str]:
    """Query names affected by the working-tree diff since ``gitref``."""
    diff = subprocess.run(
        ["git", "diff", gitref, "--", "."],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    changed_files = {
        line[len("+++ b/"):]
        for line in diff.splitlines()
        if line.startswith("+++ b/")
    }
    # 1) changed repo modules -> expand to every module that (transitively)
    #    imports one of them, so a helper edit re-checks its consumers
    imports = {
        p.stem: _module_imports(p)
        for p in (REPO / PKG).rglob("*.py")
    }
    affected = {
        Path(f).stem for f in changed_files
        if f.startswith(PKG + "/") and f.endswith(".py")
    }
    grew = True
    while grew:
        grew = False
        for mod, deps in imports.items():
            if mod not in affected and deps & affected:
                affected.add(mod)
                grew = True
    # 2) q_* names and quoted oracle keys touched in __spark_entry__ hunks
    touched: set[str] = set()
    if "__spark_entry__.py" in changed_files:
        for line in diff.splitlines():
            if line[:1] in "+-" and line[:3] not in ("+++", "---"):
                touched.update(re.findall(r"\bq_([a-z0-9_]+)", line))
                touched.update(re.findall(r'"([a-z0-9_]+)":', line))
    selected = set()
    for name, fn in qs.items():
        if name in touched:
            selected.add(name)
            continue
        try:
            src = inspect.getsource(fn)
        except OSError:
            selected.add(name)
            continue
        words = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", src))
        if words & affected:
            selected.add(name)
    return selected


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    changed_since = None
    while argv and argv[0].startswith("--"):
        if argv[0] == "--json":
            json_out = argv[1]
            argv = argv[2:]
        elif argv[0] == "--changed-since":
            changed_since = argv[1]
            argv = argv[2:]
        else:
            raise SystemExit(f"unknown flag {argv[0]}")
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    report: dict[str, dict] = {}

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = build_session("check-oracles")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if changed_since:
        sel = changed_queries(changed_since, qs)
        print(
            f"--changed-since {changed_since}: {len(sel)} of {len(qs)} "
            f"queries affected: {sorted(sel)}"
        )
        only = only & sel if only else sel
        if not only:
            print("nothing affected; exiting green")
            return 0
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": f"spark: {e}"[:200],
            }
            continue
        elapsed = time.time() - t0
        if name in PY_MODELS:
            # seeded-hash ops DuckDB can't mirror, but a pure-Python
            # model can: exact pair-set compare (tools/pymodels.py)
            ocols_raw, otups = PY_MODELS[name](sf_dir)
            ocols = sorted(ocols_raw)
            scols_ok = scols == ocols
            srows_set = {row_key(r.asDict(), scols) for r in srows}
            orows_set = {
                row_key(dict(zip(ocols_raw, t)), ocols) for t in otups
            }
            ok = scols_ok and srows_set == orows_set and len(srows) == len(
                otups
            )
            verdict = "PASS" if ok else "FAIL"
            print(
                f"{verdict} {name}: {len(srows)} rows vs py-model "
                f"{len(otups)} ({elapsed:.1f}s)"
            )
            if not ok:
                failures.append(name)
            report[name] = {
                "rows_match": len(srows) == len(otups),
                "schema_match": scols_ok,
                "hash_match": ok,
                "spark_rows": len(srows),
                "oracle_rows": len(otups),
                "err": None if ok else "py-model mismatch",
            }
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(srows)} rows, {elapsed:.1f}s)")
            report[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None,
                "err": "no_oracle",
            }
            continue
        try:
            ores = con.execute(oracles[name])
            ocols_raw = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            report[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": len(srows),
                "oracle_rows": None, "err": f"duckdb: {e}"[:200],
            }
            continue
        ocols = sorted(ocols_raw)
        problems = []
        if scols != ocols:
            problems.append(f"columns {scols} != {ocols}")
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        if not problems:
            smap = {}
            for r in srows:
                k = row_key(r.asDict(), scols)
                smap[k] = smap.get(k, 0) + 1
            omap = {}
            for r in orows:
                d = dict(zip(ocols_raw, r))
                k = row_key(d, ocols)
                omap[k] = omap.get(k, 0) + 1
            if smap != omap:
                sonly = [k for k in smap if smap[k] != omap.get(k, 0)][:3]
                oonly = [k for k in omap if omap[k] != smap.get(k, 0)][:3]
                problems.append(
                    f"values differ; spark-side sample {sonly}; "
                    f"oracle-side sample {oonly}"
                )
        if problems:
            print(f"FAIL {name} ({elapsed:.1f}s): " + " | ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name}: {len(srows)} rows ({elapsed:.1f}s)")
        report[name] = {
            "rows_match": len(srows) == len(orows),
            "schema_match": scols == ocols,
            "hash_match": not problems,
            "spark_rows": len(srows),
            "oracle_rows": len(orows),
            "err": None if not problems else "; ".join(problems)[:200],
        }
    spark.stop()
    if json_out:
        Path(json_out).write_text(json.dumps(report, indent=1) + "\n")
        print(f"wrote {json_out} ({len(report)} entries)")
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
