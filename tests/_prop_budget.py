"""Generative-test example budget (VERDICT r13 item 2).

The full suite outgrew the driver's verify window (655 tests / 2220s in
r13 — the driver's pytest run was truncated mid-dots and reported red
with zero failures). The hypothesis-based property/walker suites are the
bulk of that time and their cost is linear in ``max_examples``, so every
``@settings(max_examples=N)`` in the suite routes through :func:`ex`:

- DEFAULT (the driver's budget): each suite runs at 25% of its full
  generative budget — every test still RUNS and still shrinks failures;
  only the number of random compositions per property drops.
- ``SPARK_GRAFT_TEST_EXAMPLES_SCALE=1`` restores the full budget — the
  per-round LOCAL gate (run it before rotating queries / at round end).
- Values above 1 are honored for deeper local hunts.

No test is deleted or skipped; the declared N remains the full-budget
number in the source.
"""

from __future__ import annotations

import os


def ex(n: int) -> int:
    scale = float(os.environ.get("SPARK_GRAFT_TEST_EXAMPLES_SCALE", "0.25"))
    return max(2, round(n * scale))
