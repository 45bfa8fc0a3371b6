"""SemDeDup (cluster-then-prune semantic dedup) semantics pins.

The operator's contract: exact decimal centroids per cluster column,
nearest-centroid assignment by round(cos,6) with ties to the lowest cid,
and within-cluster keep-lowest-id pruning at round(cos,4) >= threshold.
A NumPy brute-force twin recomputes the whole contract independently."""

from __future__ import annotations

import numpy as np
import pytest

from postgres_etl_pipeline_spark.operators.similarity import semdedup


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], int(lab)) for i, v, lab in rows],
        "vec_id long, embedding array<float>, label int",
    )


def test_exact_dups_pruned_to_lowest_id(spark):
    a, b = [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]
    rows = [(0, a, 0), (1, a, 0), (2, b, 1), (3, b, 1), (4, b, 1)]
    kept = semdedup(_df(spark, rows), threshold=0.99).collect()
    assert sorted((r.vec_id, r.cid) for r in kept) == [(0, 0), (2, 1)]


def test_cross_cluster_dups_survive(spark):
    # identical vectors assigned to DIFFERENT clusters are never compared —
    # SemDeDup's deliberate blind spot (the paper prunes within cluster only)
    a, na = [1.0, 0.0], [-1.0, 0.0]
    b = [0.0, 1.0]
    # cluster 0 centroid ≈ +x (vec 0 with +x, vec 1 with -x cancel → use 3)
    rows = [(0, a, 0), (1, a, 0), (2, b, 1), (3, na, 2)]
    kept = semdedup(_df(spark, rows), threshold=0.99).collect()
    ids = sorted(r.vec_id for r in kept)
    assert 2 in ids and 3 in ids  # b and -a in their own clusters
    assert ids == [0, 2, 3]  # only the within-cluster dup (1) dropped


def test_threshold_monotone(spark):
    rng = np.random.default_rng(11)
    vecs = rng.standard_normal((40, 8))
    rows = [(i, vecs[i].tolist(), int(i % 4)) for i in range(40)]
    df = _df(spark, rows)
    kept_low = {r.vec_id for r in semdedup(df, threshold=0.2).collect()}
    kept_high = {r.vec_id for r in semdedup(df, threshold=0.8).collect()}
    assert kept_low <= kept_high  # stricter threshold prunes less


def test_matches_numpy_brute_force(spark, sf_small):
    thr = 0.35
    emb = spark.read.parquet(f"{sf_small}/embeddings.parquet").collect()
    got = {
        (r.vec_id, r.cid)
        for r in semdedup(
            spark.read.parquet(f"{sf_small}/embeddings.parquet"), threshold=thr
        ).collect()
    }

    X = np.array([[float(x) for x in r.embedding] for r in emb], dtype=np.float64)
    ids = np.array([r.vec_id for r in emb])
    labs = np.array([r.label for r in emb])
    cids = np.sort(np.unique(labs))
    # exact mean == decimal mean here: float32-origin values sum without
    # rounding at these magnitudes; assert parity rather than assume
    C = np.stack([X[labs == c].mean(axis=0) for c in cids])
    cos = (X @ C.T) / (
        np.linalg.norm(X, axis=1)[:, None] * np.linalg.norm(C, axis=1)[None, :]
    )
    best = np.round(cos, 6).argmax(axis=1)  # ties → lowest index == lowest cid
    assigned = cids[best]

    keep = set()
    for c in cids:
        members = ids[assigned == c]
        order = np.sort(members)
        Xm = {i: X[np.where(ids == i)[0][0]] for i in order}
        for i in order:
            # dropped iff ANY lower-id member is a near-dup (whether or not
            # that member was itself dropped — same rule as the operator)
            dominated = any(
                round(
                    float(
                        Xm[i] @ Xm[j]
                        / (np.linalg.norm(Xm[i]) * np.linalg.norm(Xm[j]))
                    ),
                    4,
                )
                >= thr
                for j in order[order < i]
            )
            if not dominated:
                keep.add((int(i), int(c)))
    assert got == keep


# ---------------------------------------------------------------------------
# semdedup_scaled — k ∝ N, sample-trained quantizer (verdict r06 item 2)
# ---------------------------------------------------------------------------


def test_scaled_matches_numpy_brute_force(spark, sf_small):
    """The distributed assignment + prune must equal a NumPy re-derivation
    that shares ONLY the trained centroid matrix — pinning the BLAS
    mapInPandas assignment and the within-cluster keep-lowest-id rule for
    the sample-trained path (no SQL oracle exists for driver-side Lloyd,
    so this twin is the correctness evidence)."""
    from postgres_etl_pipeline_spark.operators.similarity import (
        assign_to_centroids,  # noqa: F401  (exercised via semdedup_scaled)
        fit_coarse_quantizer,
        semdedup_scaled,
    )
    from pyspark.sql import functions as F

    thr, target = 0.35, 24
    df = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    got = {
        (r.vec_id, r.cid)
        for r in semdedup_scaled(
            df, threshold=thr, target_cluster_size=target
        ).collect()
    }

    emb = df.collect()
    n = len(emb)
    # mirror semdedup_scaled's k formula exactly, cap included
    k = min(max(2, -(-n // target)), n, 8192 // 8)
    from postgres_etl_pipeline_spark.operators.similarity import as_double_vec

    v = df.select(
        F.col("vec_id").alias("neighbor_id"),
        as_double_vec("embedding").alias("cv"),
    )
    # must mirror semdedup_scaled's fit defaults exactly
    C = fit_coarse_quantizer(v, k, kmeans_max_iter=10, fit_sample=8192)

    X = np.array([[float(x) for x in r.embedding] for r in emb], dtype=np.float64)
    ids = np.array([r.vec_id for r in emb])
    d2 = (X * X).sum(1)[:, None] - 2.0 * (X @ C.T) + (C * C).sum(1)[None, :]
    assigned = d2.argmin(1)

    keep = set()
    for c in np.unique(assigned):
        members = np.sort(ids[assigned == c])
        Xm = {i: X[np.where(ids == i)[0][0]] for i in members}
        for i in members:
            dominated = any(
                round(
                    float(
                        Xm[i] @ Xm[j]
                        / (np.linalg.norm(Xm[i]) * np.linalg.norm(Xm[j]))
                    ),
                    4,
                )
                >= thr
                for j in members[members < i]
            )
            if not dominated:
                keep.add((int(i), int(c)))
    assert got == keep


def test_scaled_invariant_to_partitioning(spark, sf_small):
    from postgres_etl_pipeline_spark.operators.similarity import semdedup_scaled

    df = spark.read.parquet(f"{sf_small}/embeddings.parquet")
    a = {
        (r.vec_id, r.cid)
        for r in semdedup_scaled(df.repartition(1), target_cluster_size=24).collect()
    }
    b = {
        (r.vec_id, r.cid)
        for r in semdedup_scaled(df.repartition(13), target_cluster_size=24).collect()
    }
    assert a == b


def test_scaled_cluster_count_tracks_corpus_size(spark):
    """k ∝ N is the whole point: growing the corpus must grow the number
    of distinct clusters, keeping expected cluster size ~constant."""
    from postgres_etl_pipeline_spark.operators.similarity import semdedup_scaled
    from pyspark.sql import functions as F

    rng = np.random.default_rng(3)

    def corpus(n):
        return spark.createDataFrame(
            [(i, rng.standard_normal(8).tolist()) for i in range(n)],
            "vec_id long, embedding array<float>",
        )

    small = semdedup_scaled(corpus(64), threshold=2.0, target_cluster_size=16)
    big = semdedup_scaled(corpus(640), threshold=2.0, target_cluster_size=16)
    n_small = small.select("cid").distinct().count()
    n_big = big.select("cid").distinct().count()
    # threshold 2.0 > max cosine → nothing pruned; cluster counts compare
    # the layout alone. ceil(64/16)=4 vs ceil(640/16)=40 trained centroids
    # (a few may end up empty — assert the scaling, not exact equality)
    assert n_big > 4 * n_small
    assert small.count() == 64 and big.count() == 640


def test_scaled_empty_input(spark):
    from postgres_etl_pipeline_spark.operators.similarity import semdedup_scaled

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert semdedup_scaled(empty).count() == 0


def test_scaled_k_past_flat_cap_uses_two_level(spark):
    """Above the flat-fit cap (fit_sample // 8) the two-level quantizer
    takes over and k ∝ N HOLDS instead of silently re-capping (verdict
    r07 weak #2, closed r08): with a tiny fit_sample the old single-level
    path would clamp to 4 clusters (expected cluster size 25× target);
    the two-level tier must keep the cluster count near N/target and emit
    NO warning."""
    import warnings

    from postgres_etl_pipeline_spark.operators.similarity import semdedup_scaled

    rng = np.random.default_rng(5)
    df = spark.createDataFrame(
        [(i, rng.standard_normal(8).tolist()) for i in range(100)],
        "vec_id long, embedding array<float>",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any quantizer warning fails
        out = semdedup_scaled(
            df, threshold=2.0, target_cluster_size=4, fit_sample=32
        )
    n_clusters = out.select("cid").distinct().count()
    # k = ceil(100/4) = 25 trained centroids >> the old cap of 4; allow
    # a few empties but the layout must be WAY past the flat cap and the
    # expected cluster size must stay near target, not 25× it
    assert n_clusters > 12, n_clusters
    assert out.count() == 100  # threshold 2.0 prunes nothing


def test_two_level_quantizer_flat_shape_and_determinism(spark):
    """fit_two_level_quantizer returns a flat (k × dims) matrix usable by
    assign_to_centroids, allocates Σk₂ᵢ = k centroids across branches,
    and is deterministic across calls and partitioning layouts."""
    from postgres_etl_pipeline_spark.operators.similarity import (
        assign_to_centroids,
        fit_two_level_quantizer,
    )

    rng = np.random.default_rng(11)
    rows = [(i, rng.standard_normal(8).tolist()) for i in range(300)]
    c = spark.createDataFrame(
        rows, "neighbor_id long, cv array<double>"
    )
    k = 40
    cents = fit_two_level_quantizer(c, k, fit_sample=128)
    assert cents.shape == (k, 8)
    again = fit_two_level_quantizer(
        c.repartition(13), k, fit_sample=128
    )
    assert np.array_equal(cents, again)
    # the flat matrix plugs into the shared assignment pass
    assigned = assign_to_centroids(c, cents)
    assert assigned.count() == 300
    cids = [r["cid"] for r in assigned.select("cid").distinct().collect()]
    assert all(0 <= x < k for x in cids)


def test_two_level_quantizer_never_over_allocates_on_skew(spark):
    """Advice r08 #1 regression: a corpus with one dominant branch plus
    many single-point branches used to over-allocate through the
    max(1, ·) floor (Σk₂ᵢ > k), silently breaking probe-all callers
    configured n_probe == n_centroids. The allocation must reclaim the
    excess and return EXACTLY k centroids."""
    from postgres_etl_pipeline_spark.operators.similarity import (
        fit_two_level_quantizer,
    )

    rng = np.random.default_rng(3)
    # 991 points tightly packed near the origin + 9 far-flung singletons:
    # the √k-split top level isolates (most of) the singletons as their
    # own branches, so the big branch's floor(quota) ≈ k while each tiny
    # branch still draws its ≥1 floor — the exact over-allocation shape
    rows = [
        (i, (rng.standard_normal(8) * 0.01).tolist()) for i in range(991)
    ]
    for j in range(9):
        vec = [0.0] * 8
        vec[j % 8] = 1000.0 * (j + 1)
        rows.append((991 + j, vec))
    c = spark.createDataFrame(rows, "neighbor_id long, cv array<double>")
    k = 100
    cents = fit_two_level_quantizer(c, k, fit_sample=2048)
    assert cents.shape == (k, 8), cents.shape


def test_ivf_twolevel_catalog_entry_engages_the_tier(spark, sf_small):
    """Verdict r08 item 4: the ivf_twolevel_topk catalog entry's config
    (n_centroids=24, fit_sample=128 → cap 16) must actually route
    through fit_two_level_quantizer — a spy wraps the tier and the
    entry's own registered callable is run, so a future config change
    that silently drops below the cap fails here, not in a stale
    docstring."""
    from postgres_etl_pipeline_spark import queries as Q
    from postgres_etl_pipeline_spark.operators import similarity as S

    Q.queries()  # populate REGISTRY (extension catalogs load lazily)
    calls = []
    real = S.fit_two_level_quantizer

    def spy(*args, **kwargs):
        out = real(*args, **kwargs)
        calls.append(out.shape)
        return out

    orig = S.fit_two_level_quantizer
    S.fit_two_level_quantizer = spy
    try:
        out = Q.REGISTRY["ivf_twolevel_topk"].fn(spark, sf_small)
        n = out.count()
    finally:
        S.fit_two_level_quantizer = orig
    assert calls, "two-level tier never ran for the catalog config"
    assert calls[0][0] == 24  # exact allocation — Σk₂ᵢ == n_centroids
    assert n > 0
