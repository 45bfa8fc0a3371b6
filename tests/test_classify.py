"""The trained quality classifier (operators/classify.py, round 13):
determinism, learning, and unseen-vocabulary semantics.

The DuckDB hash parity of the full train-then-score composition lives in
the catalog (``nb_quality_classifier_topk`` / ``nb_classifier_holdout_eval``
via tests/test_queries_vs_duckdb.py); here we pin the operator-level
properties the hash alone can't localize.
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import Row, functions as F

from postgres_etl_pipeline_spark.operators import classify as C


@pytest.fixture(scope="module")
def docs(spark, sf_small):
    return spark.read.parquet(f"{sf_small}/documents.parquet")


def _scores(df):
    return C.quality_classifier_scores(df, F.col("lang") == "en")


def test_scores_are_partitioning_invariant(spark, docs):
    """The whole train-then-score pipeline must be a pure function of
    the corpus — md5 hashing, decimal sums, and the deterministic split
    leave NOTHING for partitioning to perturb."""
    a = {r["doc_id"]: r["log_odds"] for r in _scores(docs).collect()}
    b = {
        r["doc_id"]: r["log_odds"]
        for r in _scores(docs.repartition(13)).collect()
    }
    assert a == b and len(a) == docs.count()


def _planted_docs(spark):
    """400 docs with PLANTED class-conditional vocabulary (6 class
    tokens + 4 shared tokens each) — the corpus where learning is
    possible, unlike the driver testdata's single shared distribution."""
    pos_pool = ["alpha", "beta", "gamma"]
    neg_pool = ["delta", "epsilon", "zeta"]
    shared = ["noise", "filler", "common"]
    rows = []
    for i in range(400):
        y = i % 2 == 0
        pool = pos_pool if y else neg_pool
        words = [pool[(i + j) % 3] for j in range(6)] + [
            shared[(i + j) % 3] for j in range(4)
        ]
        rows.append((i, " ".join(words), y))
    return spark.createDataFrame(
        rows, "doc_id long, text string, y boolean"
    )


def test_planted_signal_generalizes(spark):
    """The learning contract, proven where learning is possible: the
    driver's synthetic documents draw every language/source from ONE
    shared word distribution (verified — per-class token-frequency
    spreads are sampling noise), so no natural label there is learnable
    and the catalog's holdout-eval entry honestly reports near-prior
    scores. Here we PLANT class-conditional vocabulary and require the
    gate to generalize: >95% held-out accuracy, both classes."""
    docs = _planted_docs(spark)
    res = (
        C.quality_classifier_scores(docs, F.col("y"))
        .join(docs.select("doc_id", "y"), "doc_id")
        .where(~F.col("is_train"))
        .select("y", (F.col("log_odds") > 0).alias("pred"))
        .collect()
    )
    for want in (True, False):
        got = [r["pred"] for r in res if r["y"] == want]
        acc = sum(1 for p in got if p == want) / len(got)
        assert acc > 0.95, (want, acc)


def test_unseen_vocabulary_scores_prior_plus_llr0(spark, docs):
    """A document whose every token-bucket is absent from training must
    score exactly prior + n_tokens * llr0 (the smoothed baseline) — the
    left-join/coalesce path, exact to the decimal."""
    model, prior = C.nb_train(
        docs.where(C.train_split()), F.col("lang") == "en"
    )
    pr = prior.collect()[0]
    seen = {r["bucket"] for r in model.collect()}
    # craft a 2-token doc from tokens hashing to unseen buckets
    spark_ = docs.sparkSession
    cand = [f"zzqx{i}" for i in range(4096)]
    hashed = (
        spark_.createDataFrame([(w,) for w in cand], "tok string")
        .select("tok", C.md5_bucket(F.col("tok"), C.DEFAULT_N_BUCKETS).alias("b"))
        .collect()
    )
    unseen = [r["tok"] for r in hashed if r["b"] not in seen][:2]
    assert len(unseen) == 2, "testdata vocabulary saturated every bucket"
    probe = spark_.createDataFrame(
        [Row(doc_id=999_999_999, text=" ".join(unseen))]
    )
    got = C.nb_score(probe, model, prior).collect()[0]["log_odds"]
    want = (pr["prior"] + 2 * pr["llr0"]).quantize(Decimal("0.000001"))
    assert got == want


def test_model_is_bounded_by_bucket_count(spark, docs):
    """The broadcastable-model contract: at most n_buckets rows however
    large the corpus — the whole point of feature hashing."""
    model, _ = C.nb_train(docs, F.col("lang") == "en", n_buckets=256)
    assert model.count() <= 256


def test_train_split_is_half_and_deterministic(spark, docs):
    n = docs.count()
    k = docs.where(C.train_split()).count()
    assert abs(k / n - 0.5) < 0.15
    assert docs.repartition(7).where(C.train_split()).count() == k


def test_nb_scoring_sink_is_idempotent_on_redelivery(spark, sf_small, tmp_path):
    """The model-serving drain's replay contract: draining the SAME
    bounded stream twice (fresh checkpoint = full redelivery) leaves the
    keyed-upsert score table bit-identical — stateless scoring + keyed
    upsert = effectively-once."""
    from postgres_etl_pipeline_spark.queries_stream import _DOCS_SCHEMA
    from postgres_etl_pipeline_spark.streaming import runner, sources

    docs = spark.read.schema(_DOCS_SCHEMA).parquet(
        f"{sf_small}/documents.parquet"
    )
    model, prior = C.nb_train(
        docs.where(C.train_split()), F.col("lang") == "en"
    )
    out = str(tmp_path / "scores")

    def drain(tag):
        st = sources.stream_parquet(
            spark, f"{sf_small}/documents.parquet", _DOCS_SCHEMA
        )
        runner.run_nb_scoring_sink(
            st, model, prior, out, checkpoint=str(tmp_path / f"ckpt{tag}")
        )
        return {
            r["doc_id"]: r["log_odds"]
            for r in spark.read.parquet(out).collect()
        }

    first = drain("a")
    assert first == drain("b")
    batch = {
        r["doc_id"]: r["log_odds"]
        for r in C.nb_score(docs, model, prior).collect()
    }
    assert first == batch


def test_admit_top_fraction_matches_naive_window(spark, docs):
    """The distributed ranker's admitted SET must equal the naive
    one-global-window selection (the formulation the oracle states), and
    its size must be exactly ceil(frac * N) under the same IEEE double
    arithmetic both engines use."""
    import math

    from pyspark.sql import Window

    frame = _scores(docs)
    kept = C.admit_top_fraction(frame, 0.3)
    n = frame.count()
    assert kept.count() == math.ceil(0.3 * n)
    w = Window.orderBy(F.col("log_odds").cast("double").desc(), "doc_id")
    naive = (
        frame.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= math.ceil(0.3 * n))
    )
    got = {r["doc_id"] for r in kept.collect()}
    want = {r["doc_id"] for r in naive.collect()}
    assert got == want


def test_pareto_lottery_is_deterministic_and_monotone(spark, docs):
    """Admission is a pure function of the row (same set under any
    partitioning — checked on the driver corpus), and the lottery is
    monotone in quality where quality exists: on the planted-signal
    corpus (scores strongly bimodal) the positive class must be admitted
    near-surely and the negative class near the Pareto floor
    P(draw > 1) = 2^-9 ≈ 0.2%."""
    frame = _scores(docs)
    a = {r["doc_id"] for r in C.pareto_lottery_admit(frame).collect()}
    b = {
        r["doc_id"]
        for r in C.pareto_lottery_admit(frame.repartition(11)).collect()
    }
    assert a == b
    planted = _planted_docs(spark)
    adm = (
        C.pareto_lottery_admit(
            C.quality_classifier_scores(planted, F.col("y"))
        )
        .join(planted.select("doc_id", "y"), "doc_id")
        .groupBy("y")
        .count()
        .collect()
    )
    rates = {r["y"]: r["count"] / 200 for r in adm}
    assert rates.get(True, 0.0) > 0.9
    assert rates.get(False, 0.0) < 0.1


def test_curriculum_packing_orders_by_score_and_validates_args(spark, docs):
    """order_col packs ascending by the key: the doc holding the global
    offset-0 span must be the single best-scoring admitted doc (neg key
    minimal). order_col and shuffle_seed are mutually exclusive."""
    from postgres_etl_pipeline_spark.operators.text import pack_sequences

    frame = _scores(docs)
    admitted = C.admit_top_fraction(frame, 0.3).select(
        "doc_id", (-F.col("log_odds").cast("double")).alias("neg")
    )
    gated = docs.join(admitted, "doc_id")
    spans = pack_sequences(gated, seq_len=512, order_col="neg")
    first = (
        spans.where((F.col("seq_id") == 0) & (F.col("seq_off") == 0))
        .collect()
    )
    assert len(first) == 1
    best = (
        admitted.orderBy("neg", "doc_id").limit(1).collect()[0]["doc_id"]
    )
    assert first[0]["doc_id"] == best
    with pytest.raises(ValueError, match="mutually exclusive"):
        pack_sequences(gated, order_col="neg", shuffle_seed=7)
