"""Distributed connected components — the clustering step of near-dup
deduplication.

Pair finders (operators/dedup.py: jaccard_pairs, minhash_near_dups,
similarity.embedding near-dups) emit EDGES; an actual dedup pipeline needs
the transitive closure — if A~B and B~C, then {A,B,C} is one duplicate
cluster and one representative survives. This module computes per-node
component labels with pure DataFrame ops (no GraphFrames dependency).

Two algorithms, same output contract:

- ``hash_to_min`` (default): iterative label propagation — every node
  starts labeled with itself; each round a node takes the min label among
  itself and its neighbors; converged when no label changes. Rounds =
  component diameter + 1, each one shuffle join + one hash aggregate.
  Near-dup clusters are small and dense (diameter ≤ ~3), so this settles
  in a handful of rounds — the right default for dedup pipelines.
- ``star``: alternating large-star/small-star edge rewrites (Kiveris et
  al., "Connected Components in MapReduce and Beyond", SoCC'14 — public
  paper, no reference-repo counterpart), which contract every component
  to a star rooted at its min node in O(log n) rounds — the adversarial-
  shape path (long chains, high-diameter meshes) where hash-to-min would
  need O(diameter) rounds. Each round is two grouped-min aggregates + two
  node-keyed joins; convergence is detected from a count+hash signature
  of the materialized edge set (no extra pass over lineage).

Scale notes: labels are localCheckpoint'd each round so the plan does not
grow with iterations; the per-round shuffle is keyed by node id (near-
unique, no skew). The driver-side loop is control flow only — no data ever
reaches the driver except the one converged-count per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    algorithm: str = "hash_to_min",
) -> DataFrame:
    """Component label per node: (node, component) with component = min
    node id reachable. Edges are undirected; nodes not in any edge are not
    emitted (an isolated doc is trivially its own cluster).

    ``algorithm='star'`` switches to the O(log n)-round large-star/
    small-star contraction (see module docstring) — identical labels,
    different round complexity; pick it when component diameters are
    unbounded (general graphs rather than near-dup clusters)."""
    if algorithm == "star":
        return connected_components_star(edges, src, dst, max_iter)
    if algorithm != "hash_to_min":
        raise ValueError(f"unknown algorithm {algorithm!r}")
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    # Checkpoint the symmetrized edge list BEFORE the loop: its lineage is
    # the entire upstream pair-finder (minhash banding join / LSH bucket
    # join) and every round's actions would otherwise be free to re-derive
    # it — measured at sf0.1 this one checkpoint is worth ~2× on the full
    # dedup chain.
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    changed = -1
    for _ in range(max_iter):
        neighbor_labels = sym.join(
            labels, sym["src"] == labels["node"]
        ).select(F.col("dst").alias("node"), F.col("label"))
        new_labels = (
            neighbor_labels.unionByName(labels)
            .groupBy("node")
            .agg(F.min("label").alias("new_label"))
        )
        # checkpoint FIRST, then read the convergence count off the
        # materialized rows — one execution of the join+agg per round,
        # not one for the count and another for the checkpoint
        joined = labels.join(new_labels, "node").localCheckpoint(eager=True)
        changed = joined.filter(F.col("new_label") < F.col("label")).count()
        labels = joined.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            break
    if changed != 0:
        # partial labels are silently WRONG answers — fail loudly and point
        # at the O(log n) algorithm built for high-diameter graphs
        raise RuntimeError(
            f"hash-to-min did not converge in {max_iter} rounds (component "
            "diameter exceeds the round budget) — use algorithm='star' for "
            "long-chain/high-diameter graphs"
        )
    return labels.select("node", F.col("label").alias("component"))


def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node u connects each STRICTLY LARGER
    neighbor v to m = min(N(u) ∪ {u}). Emitted edges (v, m) satisfy
    v > u ≥ m, so they always point downhill and never self-loop."""
    sym = e.union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("mv"))
        .select("src", F.least("mv", F.col("src")).alias("m"))
    )
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient edges larger→smaller, then every node u
    connects its smaller neighbors AND ITSELF to m = min(N⁻(u) ∪ {u})."""
    d = e.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    j = d.join(d.groupBy("src").agg(F.min("dst").alias("m")), "src")
    return (
        j.select(F.col("dst").alias("src"), "m")
        .union(j.select("src", "m"))
        .filter(F.col("src") != F.col("m"))
        .select("src", F.col("m").alias("dst"))
        .distinct()
    )


def _canonical_edges(e0: DataFrame) -> DataFrame:
    """Undirected edge set in canonical (greatest, least) orientation,
    self-loops dropped, distinct, checkpointed."""
    return (
        e0.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


def _edge_signature(df: DataFrame) -> tuple:
    """(count, hash, hash) convergence signature of a distinct edge set.

    bit_xor: order-independent AND overflow-free under ANSI mode (sum of
    64-bit hashes would raise ARITHMETIC_OVERFLOW); the edge set is
    distinct, so xor self-cancellation can't mask a change that count
    doesn't already catch. Two INDEPENDENT hashes (the literal prefix
    re-seeds xxhash64's state) square the collision odds to ~2^-128
    (advice r05) — same one-aggregate cost.
    """
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("src", "dst")).alias("h1"),
        F.bit_xor(F.xxhash64(F.lit(0x9E3779B9), "src", "dst")).alias("h2"),
    ).collect()[0]
    return (row["n"], row["h1"], row["h2"])


def _star_fixed_point(e: DataFrame, max_iter: int) -> tuple[DataFrame, int]:
    """Alternate large-star/small-star until the edge signature is stable;
    returns (fixed-point edges, rounds taken). Raises on non-convergence."""
    sig = _edge_signature(e)
    for rounds in range(1, max_iter + 1):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        new_sig = _edge_signature(e)
        if new_sig == sig:
            return e, rounds
        sig = new_sig
    raise RuntimeError(
        f"star connected-components did not converge in {max_iter} rounds"
    )


def star_convergence_rounds(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 100
) -> int:
    """Rounds the star contraction needs on ``edges`` — the O(log n)
    measurement surface (SCALE.md chain-rounds table) sharing the exact
    production loop and signature, so a semantics change can't diverge
    from what the measurement reports."""
    e0 = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    _, rounds = _star_fixed_point(_canonical_edges(e0), max_iter)
    return rounds


def connected_components_star(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 30
) -> DataFrame:
    """Kiveris et al. alternating large-star/small-star connected
    components: O(log n) rounds on ANY graph shape, vs hash-to-min's
    O(diameter). Same output contract as :func:`connected_components`.

    Scale notes: every round's shuffles are keyed by node id (near-unique;
    the grouped mins combine map-side, so a high-degree hub costs one
    partial per task, not a hot reduce key). The edge set is
    ``localCheckpoint``'d each round — the plan never grows with
    iterations — and convergence reads a (count, hash-sum) signature off
    the just-materialized rows, so detection costs one O(1)-row aggregate,
    never a re-derivation. Raises on non-convergence instead of returning
    silently-partial labels (with the O(log n) guarantee, hitting
    ``max_iter=30`` means the input is pathological, not slow).
    """
    e0 = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    nodes = (
        e0.select(F.col("src").alias("node"))
        .union(e0.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    e = _canonical_edges(e0)
    e, _rounds = _star_fixed_point(e, max_iter)
    # Fixed point is a star forest: every non-root appears once as src
    # pointing at its component root. Re-attach nodes whose edges were
    # dropped as self-loops (and roots) via the saved node set.
    labels = e.select(F.col("src").alias("node"), F.col("dst").alias("component"))
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )


def dedup_keep_filter(
    docs: DataFrame, components: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop every clustered document except its cluster representative
    (the min doc id = the component label). Docs in no cluster pass
    through — the standard keep-one-per-near-dup-group policy."""
    losers = components.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("__loser")
    )
    return docs.join(
        losers, docs[id_col] == F.col("__loser"), "left_anti"
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 5,
    scale: int = 12,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected edge list — the
    centrality kernel next to :func:`connected_components` (e.g. ranking
    representatives inside near-dup clusters, or importance-weighting a
    citation/link graph before sampling).

    Engine-portable determinism, same discipline as the decimal money
    sums: ranks live as DECIMAL(28,``scale``). Each iteration computes
    contribution = round(rank/outdeg, scale) in double, re-casts to
    decimal, and SUMs exactly — so the per-node aggregation is
    partition-order-invariant and a SQL engine unrolling the same
    iterations reproduces every rank bit-for-bit (float summation order
    never enters; the only float ops are single divisions/multiplies of
    identical inputs). Fixed ``iterations`` rather than an epsilon stop
    keeps the result a pure function of the graph.

    Scale shape: per iteration ONE src-keyed join (ranks ⋈ edges, both
    sides hash-partitioned by node id — near-unique keys, no skew) and one
    dst-keyed map-side-combined sum; ranks are localCheckpoint'd per
    round so the plan stays flat (the CC loop's rule). Dangling nodes
    cannot exist under symmetrization (outdeg ≥ 1), so no global dangling-
    mass term is needed; nodes receive the teleport floor via a left join
    from the node list.
    """
    e0 = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    # symmetrize; dedupe so a pair listed twice doesn't double an edge
    e = (
        e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    dec = f"decimal(28,{int(scale)})"
    nodes = (
        e.groupBy("src").agg(F.count("*").alias("outdeg"))
        .withColumnRenamed("src", "node")
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.select("node", F.lit(0.0).alias("pagerank")).limit(0)
    teleport = (1.0 - damping) / n
    ranks = nodes.select(
        "node", F.round(F.lit(1.0 / n), scale).cast(dec).alias("r")
    ).localCheckpoint(eager=True)
    for _ in range(int(iterations)):
        contribs = (
            ranks.join(nodes, "node")
            .join(e, ranks["node"] == e["src"])
            .select(
                F.col("dst").alias("node"),
                F.round(
                    F.col("r").cast("double") / F.col("outdeg"), scale
                ).cast(dec).alias("c"),
            )
        )
        summed = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.select("node")
            .join(summed, "node", "left")
            .select(
                "node",
                F.round(
                    F.lit(teleport)
                    + F.lit(damping)
                    * F.coalesce(F.col("s"), F.lit(0)).cast("double"),
                    scale,
                ).cast(dec).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", F.col("r").cast("double").alias("pagerank"))


def triangle_stats(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Global triangle census of an undirected graph — ONE row
    ``(n_vertices, n_edges, n_triangles)``. On a near-dup similarity
    graph this is the density probe behind cluster-quality checks
    (boilerplate-heavy corpora produce near-cliques; triangle count
    exposes them before a keep-list collapses whole topics into one
    survivor).

    Degree-ordered enumeration (the MapReduce-classic of Suri &
    Vassilvitskii's "Counting Triangles and the Curse of the Last
    Reducer"): orient every edge from its lower endpoint to its higher
    endpoint under the TOTAL order (degree, id), then count wedges only
    at each edge's lower-ordered endpoint and close them against the
    oriented edge set. Every triangle is counted exactly once (at its
    minimum-order vertex), and — the scale point — wedge fanout is
    bounded by ORIENTED out-degree, which the (degree, id) order caps at
    O(√m) even when raw degrees are power-law: the "last reducer" hub
    that owns half the graph in a naive wedge join owns only
    high-order neighbors here. Shuffles: edge dedup + degree count +
    two joins keyed by vertex + the wedge-close join keyed by the
    (lo, hi) vertex pair — all linear in edges + wedges, wedges
    Σ out_deg² ≤ O(m^1.5).

    The count is orientation-independent, so a SQL oracle needs none of
    this: the naive a<b<c three-way self-join reproduces it exactly.
    """
    spark = edges.sparkSession
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).cast("long").alias("a"),
            F.greatest(F.col(src), F.col(dst)).cast("long").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient by the (deg, id) total order: lower endpoint -> higher
    da = deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b"))
    with_deg = und.join(da, "a").join(db, "b")
    a_first = F.struct(F.col("deg_a"), F.col("a")) < F.struct(
        F.col("deg_b"), F.col("b")
    )
    oriented = with_deg.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(a_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias(
            "deg_hi"
        ),
    )
    # wedges at the lower-ordered endpoint: unordered {v, w} out-neighbor
    # pairs, canonicalized by the same (deg, id) order so the closing
    # lookup probes the oriented edge exactly once
    o1 = oriented.select("lo", F.col("hi").alias("v"), F.col("deg_hi").alias("dv"))
    o2 = oriented.select("lo", F.col("hi").alias("w"), F.col("deg_hi").alias("dw"))
    wedges = (
        o1.join(o2, "lo")
        .filter(
            F.struct(F.col("dv"), F.col("v")) < F.struct(F.col("dw"), F.col("w"))
        )
        .select(F.col("v").alias("lo"), F.col("w").alias("hi"))
    )
    tri = wedges.join(oriented.select("lo", "hi"), ["lo", "hi"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    counts = und.agg(F.count(F.lit(1)).alias("n_edges")).crossJoin(
        deg.agg(F.count(F.lit(1)).alias("n_vertices"))
    )
    return counts.crossJoin(tri).select(
        F.col("n_vertices").cast("long").alias("n_vertices"),
        F.col("n_edges").cast("long").alias("n_edges"),
        F.col("n_triangles").cast("long").alias("n_triangles"),
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    algorithm: str = "hash-to-min",
) -> DataFrame:
    """Near-dup-aware train/val/test split: hash the CLUSTER REPRESENTATIVE,
    not the document — so every member of a near-duplicate component lands
    in the SAME split and train/test leakage through near-copies is
    impossible by construction (the classic eval-contamination failure:
    a test document whose near-duplicate sits in train scores as
    memorization, not generalization; doc-keyed hashing — the plain
    ``train_val_test_split`` — splits ~J·2·p(1−p) of each near-dup pair
    across the boundary).

    Input: the corpus and a mined near-dup pair relation (any candidate
    tier — minhash, prefix-filter, semantic). Plan: connected components
    over the pairs (the shared CC kernel, one shuffle per round), LEFT
    join back to the corpus (singletons = their own representative —
    coalesce, no row lost), then the SAME deterministic md5-bucket
    80/10/10 rule as ``train_val_test_split`` applied to the
    representative id. Engine-portable and reproducible: assignment is a
    pure function of (pair graph, stable ids).

    Returns (id_col, cluster_rep, split).
    """
    # validate against the known set — a typo must be an error, not a
    # silent fall-through to hash-to-min (advice r08 #5); both the
    # hyphen and underscore spellings are accepted because
    # connected_components' docstrings use the underscore form
    if algorithm in ("star",):
        cc = connected_components_star(pairs, a_col, b_col)
    elif algorithm in ("hash-to-min", "hash_to_min"):
        cc = connected_components(pairs, a_col, b_col)
    else:
        raise ValueError(
            f"unknown algorithm {algorithm!r}: expected 'hash-to-min' "
            "(alias 'hash_to_min') or 'star'"
        )
    rep = F.coalesce(F.col("component"), F.col(id_col)).alias("cluster_rep")
    joined = df.select(id_col).join(
        cc.withColumnRenamed("node", id_col), id_col, "left"
    )
    bucket = F.conv(
        F.substring(F.md5(F.col("cluster_rep").cast("string")), 1, 4), 16, 10
    ).cast("long")
    return (
        joined.select(F.col(id_col), rep)
        .withColumn(
            "split",
            F.when(bucket < 52429, "train")
            .when(bucket < 58982, "val")
            .otherwise("test"),
        )
    )
