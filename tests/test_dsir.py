"""DSIR (pipeline/dsir.py) vs a pure-Python model.

The model recomputes hashed n-gram features, smoothed bucket models,
importance log-weights, and the Gumbel top-k draw with hashlib/math
only — Spark must match to float tolerance (sum order differs), and
the selection set must match exactly.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from pyspark.sql import functions as F

from hbase_1_3_0_spark.pipeline import dsir

BUCKETS = 512
ALPHA = 1.0


def _toks(text: str) -> list[str]:
    return re.findall(r"[a-z0-9']+", text.lower())


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % BUCKETS


def _feats(text: str) -> Counter:
    t = _toks(text)
    grams = t + [f"{a} {b}" for a, b in zip(t, t[1:])]
    return Counter(_bucket(g) for g in grams)


def _model(docs: list[str]) -> tuple[dict[int, float], float]:
    c: Counter = Counter()
    for d in docs:
        c.update(_feats(d))
    total = sum(c.values())
    lp = {
        b: math.log((n + ALPHA) / (total + ALPHA * BUCKETS))
        for b, n in c.items()
    }
    floor = math.log(ALPHA / (total + ALPHA * BUCKETS))
    return lp, floor


def _gumbel(doc_id: int, seed: str = "dsir1") -> float:
    h = int(hashlib.md5(f"{seed}{doc_id}".encode()).hexdigest()[:8], 16)
    u = (h + 0.5) / 2**32
    return -math.log(-math.log(u))


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "pack my box with five dozen liquor jugs"),
    (2, "the quick brown fox likes the quick brown cat"),
    (3, "numbers 123 and 456 mixed with words"),
    (4, "apples oranges pears apples oranges plums"),
    (5, "the lazy dog sleeps while the quick fox runs"),
    (6, "completely unrelated vocabulary zephyr xylophone quartz"),
    (7, "five dozen jugs of liquor in my box"),
    (8, ""),
    (9, "fox fox fox fox dog dog"),
]
TARGET_IDS = {0, 2, 5, 9}  # fox/dog-flavored target distribution


def test_weights_and_resample_match_python_model(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    raw_feats = dsir.hashed_ngram_counts(docs, buckets=BUCKETS)
    tgt_feats = dsir.hashed_ngram_counts(
        docs.where(F.col("doc_id").isin(*TARGET_IDS)), buckets=BUCKETS
    )

    # featurization matches
    got_feats = {
        (r.doc_id, r.bucket): r.cnt for r in raw_feats.collect()
    }
    want_feats = {
        (i, b): n for i, t in DOCS for b, n in _feats(t).items()
    }
    assert got_feats == want_feats

    tm = dsir.bucket_model(tgt_feats, buckets=BUCKETS, alpha=ALPHA)
    rm = dsir.bucket_model(raw_feats, buckets=BUCKETS, alpha=ALPHA)
    weights = dsir.dsir_log_weights(raw_feats, tm, rm, buckets=BUCKETS, alpha=ALPHA)

    lp_t, fl_t = _model([t for i, t in DOCS if i in TARGET_IDS])
    lp_q, fl_q = _model([t for _, t in DOCS])
    want_w = {}
    for i, t in DOCS:
        f = _feats(t)
        if not f:
            continue  # empty doc has no feature rows
        want_w[i] = sum(
            n * (lp_t.get(b, fl_t) - lp_q.get(b, fl_q)) for b, n in f.items()
        )
    got_w = {r.doc_id: r.log_w for r in weights.collect()}
    assert set(got_w) == set(want_w)
    for i, w in want_w.items():
        assert abs(got_w[i] - w) < 1e-9, i

    picked = dsir.dsir_resample(weights, k=4, seed="dsir1").collect()
    want_scores = sorted(
        ((w + _gumbel(i), i) for i, w in want_w.items()), reverse=True
    )[:4]
    assert [r.doc_id for r in picked] == [i for _, i in want_scores]
    for r in picked:
        assert abs(r.score - (want_w[r.doc_id] + _gumbel(r.doc_id))) < 1e-9


def test_target_skew_selects_target_like_docs(spark):
    # docs sharing the target's vocabulary should outrank the
    # deliberately-alien doc 6
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    raw_feats = dsir.hashed_ngram_counts(docs, buckets=BUCKETS)
    tgt_feats = dsir.hashed_ngram_counts(
        docs.where(F.col("doc_id").isin(*TARGET_IDS)), buckets=BUCKETS
    )
    tm = dsir.bucket_model(tgt_feats, buckets=BUCKETS)
    rm = dsir.bucket_model(raw_feats, buckets=BUCKETS)
    w = {
        r.doc_id: r.log_w
        for r in dsir.dsir_log_weights(
            raw_feats, tm, rm, buckets=BUCKETS
        ).collect()
    }
    assert w[2] > w[6]  # in-target doc beats alien vocabulary
    assert w[9] > w[6]


def test_gumbel_draw_is_deterministic(spark):
    docs = spark.createDataFrame(DOCS[:6], "doc_id long, text string")
    feats = dsir.hashed_ngram_counts(docs, buckets=BUCKETS)
    m = dsir.bucket_model(feats, buckets=BUCKETS)
    w = dsir.dsir_log_weights(feats, m, m, buckets=BUCKETS)
    a = [r.doc_id for r in dsir.dsir_resample(w, k=3).collect()]
    b = [r.doc_id for r in dsir.dsir_resample(w, k=3).collect()]
    assert a == b
    # p == q means log_w == 0 for every doc: selection is pure Gumbel
    assert {
        r.log_w for r in dsir.dsir_log_weights(feats, m, m, buckets=BUCKETS).collect()
    } == {0.0}
