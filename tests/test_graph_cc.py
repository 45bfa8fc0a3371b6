"""Connected-components semantics (operators/graph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgres_etl_pipeline_spark.operators.graph import (
    connected_components,
    connected_components_star,
    dedup_keep_filter,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_chain_and_separate_components(spark):
    # 1-2-3-4 chain (diameter 3: exercises multi-round propagation),
    # {10, 11} pair, and a self-contained triangle {20, 21, 22}
    cc = connected_components(
        _edges(
            spark,
            [(2, 1), (2, 3), (4, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        )
    )
    got = {r.node: r.component for r in cc.collect()}
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_empty_edges(spark):
    cc = connected_components(_edges(spark, []))
    assert cc.count() == 0


def test_duplicate_and_reversed_edges_are_harmless(spark):
    cc = connected_components(
        _edges(spark, [(1, 2), (2, 1), (1, 2), (2, 3)])
    )
    got = {r.node: r.component for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1}


class TestStarAlgorithm:
    """Large-star/small-star CC (Kiveris et al.) — the O(log n)-round path
    for adversarial graph shapes (round-4 verdict item 3)."""

    def test_matches_hash_to_min_on_random_graphs(self, spark):
        import random

        rng = random.Random(42)
        for _trial in range(3):
            n = 60
            pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(70)]
            df = _edges(spark, pairs)  # includes self-loops + duplicates
            a = {(r.node, r.component) for r in connected_components(df).collect()}
            b = {
                (r.node, r.component)
                for r in connected_components(df, algorithm="star").collect()
            }
            assert a == b and len(a) > 0

    def test_long_chain_converges_in_log_rounds(self, spark):
        """A 300-node chain has diameter 299 — hash-to-min needs ~299
        rounds, the star contraction O(log n): empirically 10. Cap
        max_iter at 12 so a regression to per-hop propagation FAILS."""
        chain = _edges(spark, [(i, i + 1) for i in range(299)])
        got = {
            r.node: r.component
            for r in connected_components_star(chain, max_iter=12).collect()
        }
        assert got == {i: 0 for i in range(300)}

    def test_long_chain_makes_hash_to_min_fail_loudly(self, spark):
        """hash-to-min must raise on non-convergence (silently-partial
        labels are wrong answers), naming the star alternative."""
        chain = _edges(spark, [(i, i + 1) for i in range(40)])
        with pytest.raises(RuntimeError, match="algorithm='star'"):
            connected_components(chain, max_iter=3)

    def test_empty_and_self_loop_edges(self, spark):
        assert connected_components_star(_edges(spark, [])).count() == 0
        got = {
            r.node: r.component
            for r in connected_components_star(
                _edges(spark, [(5, 5), (1, 2)])
            ).collect()
        }
        # self-loop node 5 is kept as its own singleton component
        assert got == {5: 5, 1: 1, 2: 1}

    def test_unknown_algorithm_raises(self, spark):
        with pytest.raises(ValueError, match="unknown algorithm"):
            connected_components(_edges(spark, [(1, 2)]), algorithm="bogus")


def test_keep_filter_drops_non_representatives(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (9, "z")], "doc_id long, text string"
    )
    cc = connected_components(_edges(spark, [(1, 2), (2, 3)]))
    kept = dedup_keep_filter(docs, cc)
    assert {r.doc_id for r in kept.collect()} == {1, 9}
    # isolated doc 9 (no edges) passes through untouched
    assert kept.filter(F.col("doc_id") == 9).count() == 1


class TestPageRank:
    def _edges(self, spark, pairs):
        return spark.createDataFrame(pairs, "src long, dst long")

    def test_star_center_ranks_highest_and_mass_conserved(self, spark):
        from postgres_etl_pipeline_spark.operators.graph import pagerank

        # star: 0 connected to 1..4 — center must dominate
        e = self._edges(spark, [(0, i) for i in range(1, 5)])
        ranks = {r.node: r.pagerank for r in pagerank(e).collect()}
        assert max(ranks, key=ranks.get) == 0
        leaf = {v for k, v in ranks.items() if k != 0}
        assert len(leaf) == 1  # symmetric leaves, identical rank
        assert abs(sum(ranks.values()) - 1.0) < 1e-9  # no dangling mass loss

    def test_matches_numpy_power_iteration(self, spark):
        import numpy as np

        from postgres_etl_pipeline_spark.operators.graph import pagerank

        pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
        e = self._edges(spark, pairs)
        got = {r.node: r.pagerank for r in pagerank(e, iterations=5).collect()}

        # full-precision numpy twin (rounding in the operator is 1e-12;
        # compare within 1e-9)
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        nodes = sorted(adj)
        n = len(nodes)
        r = np.full(n, 1.0 / n)
        for _ in range(5):
            nxt = np.full(n, 0.15 / n)
            for i, u in enumerate(nodes):
                for v in adj[u]:
                    nxt[nodes.index(v)] += 0.85 * r[i] / len(adj[u])
            r = nxt
        for i, u in enumerate(nodes):
            assert abs(got[u] - r[i]) < 1e-9

    def test_partitioning_invariant(self, spark):
        from postgres_etl_pipeline_spark.operators.graph import pagerank

        pairs = [(i, (i + 1) % 20) for i in range(20)] + [(0, 10), (5, 15)]
        e1 = self._edges(spark, pairs).repartition(1)
        e7 = self._edges(spark, pairs).repartition(7)
        r1 = sorted((r.node, r.pagerank) for r in pagerank(e1).collect())
        r7 = sorted((r.node, r.pagerank) for r in pagerank(e7).collect())
        assert r1 == r7  # decimal-exact sums: bit-identical, not just close

    def test_empty_edges(self, spark):
        from postgres_etl_pipeline_spark.operators.graph import pagerank

        e = self._edges(spark, []).filter("src > 0")
        assert pagerank(e).collect() == []


# ---------------------------------------------------------------------------
# triangle_stats — degree-ordered triangle census
# ---------------------------------------------------------------------------


def _tri(spark, edges):
    from postgres_etl_pipeline_spark.operators.graph import triangle_stats

    df = spark.createDataFrame(edges, "src long, dst long")
    return triangle_stats(df).collect()[0]


def test_triangles_known_graphs(spark):
    # 4-clique: C(4,3) = 4 triangles
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    r = _tri(spark, k4)
    assert (r.n_vertices, r.n_edges, r.n_triangles) == (4, 6, 4)

    # path graph: none
    r = _tri(spark, [(0, 1), (1, 2), (2, 3)])
    assert (r.n_vertices, r.n_edges, r.n_triangles) == (4, 3, 0)

    # two triangles sharing edge (1,2)
    r = _tri(spark, [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)])
    assert (r.n_vertices, r.n_edges, r.n_triangles) == (4, 5, 2)

    # star hub (the last-reducer shape): many wedges, zero triangles
    r = _tri(spark, [(0, i) for i in range(1, 20)])
    assert (r.n_vertices, r.n_edges, r.n_triangles) == (20, 19, 0)


def test_triangles_invariant_to_direction_duplicates_loops(spark):
    base = [(0, 1), (0, 2), (1, 2)]
    messy = base + [(1, 0), (2, 0), (2, 1), (0, 1), (1, 1)]  # dups+reversed+loop
    a, b = _tri(spark, base), _tri(spark, messy)
    assert (a.n_vertices, a.n_edges, a.n_triangles) == (3, 3, 1)
    assert (b.n_vertices, b.n_edges, b.n_triangles) == (3, 3, 1)


def test_triangles_empty(spark):
    r = _tri(spark, [(1, 1)])  # only a self-loop: filtered, empty graph
    assert (r.n_vertices, r.n_edges, r.n_triangles) == (0, 0, 0)


def test_leakage_safe_split_never_splits_a_component(spark, sf_small):
    """The guarantee itself: every mined near-dup pair lands in ONE split
    (doc-keyed hashing provably violates this on any pair whose members
    hash differently), every corpus doc is assigned exactly once, and
    singletons keep the plain train_val_test_split assignment (their
    representative IS the doc id — the two entries agree outside
    components)."""
    from pyspark.sql import functions as F

    from postgres_etl_pipeline_spark.operators.dedup import minhash_near_dups
    from postgres_etl_pipeline_spark.operators.graph import leakage_safe_split
    from postgres_etl_pipeline_spark.queries import REGISTRY, queries as load_all, spread, t

    load_all()
    docs = t(spark, sf_small, "documents")
    pairs = minhash_near_dups(spread(docs), threshold=0.5).select(
        "doc_a", "doc_b"
    )
    out = leakage_safe_split(docs, pairs)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()

    a = out.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = out.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    crossing = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert crossing == 0

    plain = REGISTRY["train_val_test_split"].fn(spark, sf_small)
    joined = out.filter(F.col("cluster_rep") == F.col("doc_id")).join(
        plain.withColumnRenamed("split", "plain_split"), "doc_id"
    )
    assert joined.filter(F.col("split") != F.col("plain_split")).count() == 0


def test_leakage_safe_split_rejects_unknown_algorithm(spark):
    """A typo'd algorithm must raise, never silently fall through to
    hash-to-min (advice r08 #5); both documented spellings work."""
    import pytest

    from postgres_etl_pipeline_spark.operators.graph import leakage_safe_split

    docs = spark.createDataFrame([(1,), (2,)], "doc_id long")
    pairs = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="unknown algorithm"):
        leakage_safe_split(docs, pairs, algorithm="hash-to-mni")
    for alg in ("hash-to-min", "hash_to_min", "star"):
        assert leakage_safe_split(docs, pairs, algorithm=alg).count() == 2
