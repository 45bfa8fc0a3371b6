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
