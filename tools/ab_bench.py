"""Paired A/B bench runner (VERDICT r13 item 7): every perf claim this
round cites a paired run from this tool instead of two full-bench runs
taken at different times on a noisy shared host.

Alternates the two sides per sample round — A, B, A, B, ... — inside one
runner session, so host weather lands on both sides equally; each side's
estimate is the min over its rounds (the repo's standing noise protocol),
and the interleaved ``b-calibrate`` samples from every invocation are
pooled into one calibration spread for the whole session.

Two modes:

- two git worktrees / checkouts::

    python tools/ab_bench.py --rows b-lm,b-lm3 --a /path/to/old --b . \
        [--pairs 3] [--sf-dir ...] [--cpus N]

  Each sample round launches ``bench.py`` from the given tree with
  ``SPARK_GRAFT_BENCH_ONLY=<rows>``.

- one tree, env-flagged change: pass ``--a-env K=V --b-env K=V`` with
  ``--a . --b .`` and gate the change on the env var in code.

Output: one JSON line {"rows": {...}, "calibration": {...}, "pairs": N}
with per-row {"a": min, "b": min, "speedup": a/b, "samples_a": [...],
"samples_b": [...]}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def run_side(tree: str, rows: str, env_extra: dict, sf_dir: str, cpus: str):
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = rows
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_CPUS"] = cpus
    env["SPARK_GRAFT_BENCH_RUNS"] = "1"
    env.update(env_extra)
    out = subprocess.run(
        [sys.executable, os.path.join(tree, "bench.py")],
        capture_output=True, text=True, env=env, cwd=tree,
    )
    if out.returncode != 0:
        raise SystemExit(
            f"bench failed in {tree}: rc={out.returncode}\n{out.stderr[-2000:]}"
        )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def parse_env(pairs: list[str]) -> dict:
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        out[k] = v
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", required=True)
    ap.add_argument("--a", required=True, help="tree for side A (old)")
    ap.add_argument("--b", required=True, help="tree for side B (new)")
    ap.add_argument("--a-env", action="append", default=[])
    ap.add_argument("--b-env", action="append", default=[])
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32")
    )
    args = ap.parse_args()
    a_env, b_env = parse_env(args.a_env), parse_env(args.b_env)
    samples: dict[str, dict[str, list[float]]] = {}
    cal: list[float] = []
    for i in range(args.pairs):
        for side, tree, env in (("a", args.a, a_env), ("b", args.b, b_env)):
            res = run_side(tree, args.rows, env, args.sf_dir, args.cpus)
            for name, sec in res["queries"].items():
                if name == "b-calibrate":
                    cal.append(sec)
                    continue
                samples.setdefault(name, {"a": [], "b": []})[side].append(sec)
            print(
                f"pair {i + 1}/{args.pairs} side {side}: "
                + json.dumps(res["queries"]),
                file=sys.stderr,
            )
    rows = {}
    for name, s in samples.items():
        a, b = min(s["a"]), min(s["b"])
        rows[name] = {
            "a": a, "b": b, "speedup": round(a / b, 3) if b else None,
            "samples_a": s["a"], "samples_b": s["b"],
        }
    calibration = (
        {
            "min": round(min(cal), 3),
            "max": round(max(cal), 3),
            "spread": round(max(cal) / max(min(cal), 1e-9), 2),
        }
        if cal
        else None
    )
    print(json.dumps(
        {"rows": rows, "calibration": calibration, "pairs": args.pairs}
    ))


if __name__ == "__main__":
    main()
