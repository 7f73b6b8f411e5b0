"""Quality classifier (pipeline/classifier.py) behavior tests.

Exact numeric equivalence with the pure-Python trainer is covered by
tools/pymodels.py quality_classifier_model via check_oracles; these
tests cover the library contract: class separation, zero-token docs,
determinism across runs, and the model-shape guarantees.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_1_3_0_spark.pipeline import classifier

POS = [
    (0, "excellent prose with varied vocabulary and clear structure"),
    (1, "thoughtful writing exhibits clarity and careful argument"),
    (2, "clear careful prose with excellent structure and argument"),
    (3, "varied vocabulary excellent clarity thoughtful structure"),
]
NEG = [
    (10, "buy cheap buy cheap buy cheap click here click here"),
    (11, "click buy cheap here click buy cheap here spam spam"),
    (12, "spam spam cheap click buy here spam cheap click"),
    (13, "here here buy buy cheap cheap click click spam"),
]


def _train(spark, **kw):
    pos = spark.createDataFrame(POS, "doc_id long, text string")
    neg = spark.createDataFrame(NEG, "doc_id long, text string")
    return classifier.train_quality_classifier(
        pos, neg, buckets=256, iterations=8, **kw
    )


def test_separates_classes(spark):
    w = _train(spark)
    both = spark.createDataFrame(POS + NEG, "doc_id long, text string")
    scores = {
        r.doc_id: r.score
        for r in classifier.score_quality(both, w, buckets=256).collect()
    }
    pos_scores = [scores[i] for i, _ in POS]
    neg_scores = [scores[i] for i, _ in NEG]
    assert min(pos_scores) > max(neg_scores)


def test_model_shape_and_bias_row(spark):
    w = _train(spark)
    rows = w.collect()
    buckets = {r.bucket for r in rows}
    assert classifier.BIAS_BUCKET in buckets
    assert all(b >= -1 for b in buckets)
    assert len(rows) <= 257  # at most buckets + bias


def test_zero_token_doc_scores_at_bias(spark):
    import math

    w = _train(spark)
    bias = {r.bucket: r.w for r in w.collect()}[classifier.BIAS_BUCKET]
    df = spark.createDataFrame(
        [(99, ""), (100, None), (101, "excellent clear prose")],
        "doc_id long, text string",
    )
    scores = {
        r.doc_id: r.score
        for r in classifier.score_quality(df, w, buckets=256).collect()
    }
    assert set(scores) == {99, 100, 101}
    want = 1.0 / (1.0 + math.exp(-bias))
    assert abs(scores[99] - want) < 1e-12
    assert abs(scores[100] - want) < 1e-12


def test_training_is_deterministic(spark):
    w1 = {(r.bucket, round(r.w, 12)) for r in _train(spark).collect()}
    w2 = {(r.bucket, round(r.w, 12)) for r in _train(spark).collect()}
    assert w1 == w2


def test_raises_on_empty_training_set(spark):
    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    with pytest.raises(ValueError):
        classifier.train_quality_classifier(empty, empty, buckets=64)


def test_l2_shrinks_weights(spark):
    w_reg = {
        r.bucket: r.w for r in _train(spark, l2=0.05).collect()
    }
    w_free = {r.bucket: r.w for r in _train(spark, l2=0.0).collect()}
    reg_norm = sum(
        v * v for b, v in w_reg.items() if b != classifier.BIAS_BUCKET
    )
    free_norm = sum(
        v * v for b, v in w_free.items() if b != classifier.BIAS_BUCKET
    )
    assert reg_norm < free_norm
