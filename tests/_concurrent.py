"""Run independent read-assert closures concurrently (guide §2.6).

The pin suites replay reference scenarios as many INDEPENDENT tiny
scans/gets against one immutable table state, issued serially — each
pays its own full Catalyst-planning + job round trip (~0.5–1.5 s at
test scale), which is the suites' wall-clock floor. Spark's scheduler
happily runs several driver-submitted jobs at once, so a small thread
pool overlaps them (measured 1.57× on a 7-read block; bounded by
driver-side planning under the GIL, not by executor capacity).

Use ONLY for reads of the same immutable table state — never to overlap
mutations or reads whose table differs per closure. Results return in
input order; assertion messages stay per-call-site.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor


def gather(*thunks, workers: int = 8):
    """Evaluate the zero-arg callables concurrently; return their
    results in input order (exceptions propagate)."""
    with ThreadPoolExecutor(max_workers=workers) as pool:
        futures = [pool.submit(t) for t in thunks]
        return [f.result() for f in futures]
