"""Deterministic sampling / mixing / sequence packing (pipeline.sampling)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hbase_1_3_0_spark.pipeline import sampling
from tests.conftest import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents").cache()


def test_rate_to_hex_bounds_and_monotone():
    assert sampling.rate_to_hex(0.0) == "00000000"
    assert sampling.rate_to_hex(1.0) == "g"  # sorts after all hex
    assert sampling.rate_to_hex(-1) == "00000000"
    hexes = [sampling.rate_to_hex(r) for r in (0.1, 0.25, 0.5, 0.8)]
    assert hexes == sorted(hexes)
    assert sampling.rate_to_hex(0.5) == "80000000"


def test_stratified_sample_deterministic(docs):
    rates = {"src0": 0.8, "src1": 0.5}
    a = set(
        r.doc_id
        for r in sampling.stratified_sample(docs, rates, default_rate=0.1)
        .select("doc_id")
        .collect()
    )
    b = set(
        r.doc_id
        for r in sampling.stratified_sample(docs, rates, default_rate=0.1)
        .select("doc_id")
        .collect()
    )
    assert a == b and a  # same membership on every run, non-empty


def test_exact_k_sample_quotas(docs):
    out = sampling.exact_k_sample(
        docs, {"src1": 7, "src4": 3, "src19": 10_000}, default_k=2
    )
    counts = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts["src1"] == 7 and counts["src4"] == 3
    # quota above stratum size keeps the whole stratum
    assert counts["src19"] == totals["src19"]
    others = [s for s in totals if s not in ("src1", "src4", "src19")]
    assert all(counts[s] == 2 for s in others)
    # deterministic membership across runs
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in sampling.exact_k_sample(
            docs, {"src1": 7, "src4": 3, "src19": 10_000}, default_k=2
        ).collect()
    )
    assert a == b
    # a larger quota keeps a SUPERSET (ranking is quota-independent)
    bigger = set(
        r.doc_id
        for r in sampling.exact_k_sample(
            docs, {"src1": 12}, default_k=2
        ).where(F.col("source") == "src1").collect()
    )
    smaller = set(
        r.doc_id
        for r in sampling.exact_k_sample(
            docs, {"src1": 7}, default_k=2
        ).where(F.col("source") == "src1").collect()
    )
    assert smaller < bigger


def test_stratified_sample_rate_ordering(docs):
    # higher rate keeps a superset-sized sample within each stratum
    lo = sampling.stratified_sample(docs, {}, default_rate=0.2).count()
    hi = sampling.stratified_sample(docs, {}, default_rate=0.8).count()
    total = docs.count()
    assert lo < hi <= total
    # nested property: the 0.2 sample is a SUBSET of the 0.8 sample
    lo_ids = set(
        r.doc_id
        for r in sampling.stratified_sample(docs, {}, default_rate=0.2)
        .select("doc_id")
        .collect()
    )
    hi_ids = set(
        r.doc_id
        for r in sampling.stratified_sample(docs, {}, default_rate=0.8)
        .select("doc_id")
        .collect()
    )
    assert lo_ids <= hi_ids


def test_stratified_zero_and_one(docs):
    assert sampling.stratified_sample(docs, {}, default_rate=0.0).count() == 0
    assert (
        sampling.stratified_sample(docs, {}, default_rate=1.0).count()
        == docs.count()
    )


def test_train_eval_split_partition(docs):
    out = sampling.train_eval_split(docs, eval_frac=0.1)
    counts = {r.split: r.cnt for r in out.groupBy("split").agg(
        F.count(F.lit(1)).alias("cnt")).collect()}
    assert counts.get("eval", 0) + counts.get("train", 0) == docs.count()
    assert counts.get("eval", 0) > 0


def test_split_is_narrow_plan(docs):
    # sampling must be a pure map: no Exchange in the physical plan
    plan = sampling.stratified_sample(
        docs, {"src0": 0.5}, default_rate=0.1
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_invariants(docs):
    cap = 256
    out = sampling.pack_sequences(docs, capacity=cap).collect()
    assert len(out) == docs.count()
    by_src: dict[str, list] = {}
    for r in out:
        assert 0 <= r.bin_off < cap
        assert r.spill == max(0, r.bin_off + r.n_tokens - cap)
        by_src.setdefault(r.source, []).append(r)
    for rows in by_src.values():
        rows.sort(key=lambda r: r.doc_id)
        # the tape has no gaps: each doc starts where the previous ended
        pos = 0
        for r in rows:
            assert r.bin_id * cap + r.bin_off == pos
            pos += r.n_tokens


def test_pack_sequences_custom_token_col(spark):
    df = spark.createDataFrame(
        [("s", 1, 100), ("s", 2, 200), ("s", 3, 300)],
        "source: string, doc_id: long, toks: long",
    )
    rows = {
        r.doc_id: r
        for r in sampling.pack_sequences(
            df, capacity=256, token_col=F.col("toks")
        ).collect()
    }
    assert (rows[1].bin_id, rows[1].bin_off, rows[1].spill) == (0, 0, 0)
    assert (rows[2].bin_id, rows[2].bin_off, rows[2].spill) == (0, 100, 44)
    assert (rows[3].bin_id, rows[3].bin_off, rows[3].spill) == (1, 44, 88)


def test_temperature_mix_alpha_lifts_small_sources(spark):
    from hbase_1_3_0_spark.pipeline import sampling

    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id: long, source: string")
    rates = {r.source: r for r in sampling.temperature_mix_rates(
        df, alpha=0.5, target_frac=0.3
    ).collect()}
    # tempered shares: sqrt(900)=30, sqrt(100)=10 -> 0.75 / 0.25
    assert rates["big"].mix_weight == 0.75
    assert rates["small"].mix_weight == 0.25
    # small source keeps a HIGHER fraction of itself than the big one
    assert rates["small"].keep_rate > rates["big"].keep_rate
    # expected volume = target_frac of corpus (no rate hits the cap here)
    exp = rates["big"].keep_rate * 900 + rates["small"].keep_rate * 100
    assert abs(exp - 300) < 1
    # oversample demand on the small source caps at 1.0 (documented)
    capped = {r.source: r.keep_rate for r in sampling.temperature_mix_rates(
        df, alpha=0.5, target_frac=0.5
    ).collect()}
    assert capped["small"] == 1.0
    # alpha=1 -> proportional: every keep_rate == target_frac
    prop = {r.source: r.keep_rate for r in sampling.temperature_mix_rates(
        df, alpha=1.0, target_frac=0.3
    ).collect()}
    assert all(abs(v - 0.3) < 1e-6 for v in prop.values())
    # end-to-end sample is deterministic and roughly sized
    got1 = {r.doc_id for r in sampling.temperature_sample(df, alpha=0.5, target_frac=0.3).collect()}
    got2 = {r.doc_id for r in sampling.temperature_sample(df, alpha=0.5, target_frac=0.3).collect()}
    assert got1 == got2
    assert 200 < len(got1) < 400


# ---- UniMax budget allocation (Chung et al., ICLR 2023) ------------------


def _unimax_greedy(counts: dict, budget: float, epochs: float) -> dict:
    """The paper's Algorithm 1, literally: repeatedly offer every
    remaining language the uniform share of the remaining budget; cap
    and remove the ones whose corpus x epochs is smaller; stop when an
    iteration caps nothing."""
    caps = {l: n * epochs for l, n in counts.items()}
    alloc = {}
    remaining = dict(caps)
    b = budget
    while remaining:
        share = b / len(remaining)
        newly = {l: u for l, u in remaining.items() if u <= share}
        if not newly:
            for l in remaining:
                alloc[l] = share
            return alloc
        for l, u in newly.items():
            alloc[l] = u
            b -= u
            del remaining[l]
    return alloc


def test_unimax_matches_greedy_random(spark):
    import random

    from hbase_1_3_0_spark.pipeline.sampling import unimax_allocation

    rng = random.Random(31)
    for trial in range(8):
        langs = {f"l{i:02d}": rng.randint(1, 10_000) for i in
                 range(rng.randint(1, 12))}
        total = sum(langs.values())
        budget = rng.uniform(0.05, 3.0) * total
        epochs = rng.choice([1.0, 2.0, 4.0])
        rows = [(l, n) for l, n in langs.items()]
        df = spark.createDataFrame(rows, "lang string, tokens long")
        got = {
            r.lang: (r.alloc, r.capped)
            for r in unimax_allocation(
                df, total_budget=budget, max_epochs=epochs,
                weight_col=F.col("tokens"),
            ).collect()
        }
        exp = _unimax_greedy(langs, budget, epochs)
        assert set(got) == set(exp), trial
        for l, a in exp.items():
            assert abs(got[l][0] - a) < 1e-4, (trial, l, got[l][0], a)
            assert got[l][1] == (abs(a - langs[l] * epochs) < 1e-9), (
                trial, l)


def test_unimax_decision_table(spark):
    from hbase_1_3_0_spark.pipeline.sampling import unimax_allocation

    # corpus sizes 10 / 100 / 1000, budget 600, 1 epoch:
    # l0 caps at 10; remaining 590 splits 295/295 (l1 caps? 100 <= 295
    # -> caps at 100); remaining 490 -> l2 gets 490 of its 1000
    df = spark.createDataFrame(
        [("l0", 10), ("l1", 100), ("l2", 1000)], "lang string, tokens long"
    )
    got = {
        r.lang: r
        for r in unimax_allocation(
            df, total_budget=600, max_epochs=1.0, weight_col=F.col("tokens")
        ).collect()
    }
    assert (got["l0"].alloc, got["l0"].capped) == (10.0, True)
    assert (got["l1"].alloc, got["l1"].capped) == (100.0, True)
    assert (got["l2"].alloc, got["l2"].capped) == (490.0, False)
    assert got["l2"].epochs == 0.49
    # budget above the whole corpus x epochs: everything caps
    got2 = {
        r.lang: r
        for r in unimax_allocation(
            df, total_budget=10_000, max_epochs=2.0,
            weight_col=F.col("tokens"),
        ).collect()
    }
    assert all(r.capped for r in got2.values())
    assert got2["l2"].epochs == 2.0


def test_cluster_balanced_sample_quota_and_assignment(spark):
    """cluster_balanced_sample: nearest-centroid argmax with 6dp
    rounding and larger-index tie-breaks; exactly k per cluster."""
    from hbase_1_3_0_spark.pipeline.sampling import cluster_balanced_sample

    # two orthogonal centroids; vectors constructed with known winners
    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = []
    for i in range(20):
        if i % 3 == 0:
            rows.append((i, [1.0, 0.1]))   # cluster 0
        elif i % 3 == 1:
            rows.append((i, [0.1, 1.0]))   # cluster 1
        else:
            rows.append((i, [0.5, 0.5]))   # exact tie -> larger index 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cluster_balanced_sample(
        df, cents, k_per_cluster=4, vec_col="embedding", id_col="vec_id"
    ).collect()
    by_cluster: dict[int, list[int]] = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, []).append(r.vec_id)
    # ties went to cluster 1; both clusters capped at exactly 4
    assert sorted(by_cluster) == [0, 1]
    assert len(by_cluster[0]) == 4 and len(by_cluster[1]) == 4
    assert all(v % 3 == 0 for v in by_cluster[0])
    assert all(v % 3 != 0 for v in by_cluster[1])
    # determinism: the same seed picks the same rows
    out2 = cluster_balanced_sample(
        df, cents, k_per_cluster=4, vec_col="embedding", id_col="vec_id"
    ).collect()
    assert sorted((r.vec_id, r.cluster_id) for r in out) == sorted(
        (r.vec_id, r.cluster_id) for r in out2
    )
