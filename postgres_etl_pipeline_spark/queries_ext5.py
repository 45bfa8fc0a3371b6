"""Extension catalog, batch 5 (round 7): scale-safety follow-through on
the round-6 additions — SemDeDup with the cluster count tied to corpus
size (k ∝ N, the paper's actual scaling knob), plus the CDC
tombstone-compaction audit (the GC half of the delete-capable K5 sink).

Same registry/oracle conventions as queries_ext.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import register, spread, t
from .queries_ext import _NORM, _TOKS

# ---------------------------------------------------------------------------
# SemDeDup, scale-safe configuration — k ∝ N via the sample-trained
# coarse quantizer (verdict r06 item 2)
# ---------------------------------------------------------------------------


# The keep-list's VALUES are engine-specific (driver-side sample-trained
# Lloyd has no SQL expression), but its STRUCTURAL invariants are
# centroid-independent truths — so the entry emits the invariant-audit
# relation and the oracle is the constant SQL stating those truths
# (verdict r09 item 8: DuckDB checks the relation's structural
# properties rather than hashing values). A hash-green row therefore
# certifies that Spark-side verification of all five properties
# PASSED over real semdedup output; the NumPy twin in test_semdedup.py
# remains the value-level evidence, and the fixed-label
# `semdedup_keep_list` entry hash-oracles the prune rule cross-engine.
_SEMDEDUP_INVARIANT_ORACLE = """
    SELECT i.invariant, TRUE AS holds,
           CAST((SELECT count(*) FROM embeddings) AS BIGINT) AS n_corpus
    FROM (
      SELECT unnest([
        'assignment_partitions_corpus',
        'deterministic_under_repartition',
        'dropped_rows_have_lower_id_witness',
        'every_cluster_keeps_min_id',
        'no_kept_pair_reaches_threshold'
      ]) AS invariant
    ) i
    """


@register(
    "semdedup_scaled_keep_list",
    _SEMDEDUP_INVARIANT_ORACLE,
    survey="§7 north-star: SemDeDup at the paper's scaling point — "
    "k ∝ N sample-trained k-means keeps expected cluster size constant, "
    "so within-cluster pairwise work is O(N·target_size), linear in the "
    "corpus (the fixed-label twin measured 7.0× wall at 10× data; this "
    "configuration is the 100 TB shape, SCALE.md row). Round 10 "
    "(verdict r09 item 8): driver-checked via the INVARIANT ORACLE — "
    "the emitted relation is the audit of five centroid-independent "
    "structural properties (justified partition, min-id kept, no "
    "over-threshold survivors, repartition determinism), hash-pinned "
    "against the constant SQL stating them",
    tags=("ext", "similarity", "dedup"),
)
def semdedup_scaled_keep_list(spark, sf_dir):
    """SemDeDup k ∝ N, surfaced through its invariant audit: the audit
    recomputes the deterministic fit, runs the full prune, VERIFIES the
    five structural properties over (corpus, assignment, keep-list) —
    including a repartitioned recompute — and emits one row per
    property. See operators.similarity.semdedup_scaled_invariants."""
    from .operators.similarity import semdedup_scaled_invariants

    return semdedup_scaled_invariants(
        spread(t(spark, sf_dir, "embeddings")),
        threshold=0.35,
        target_cluster_size=64,
    )


# ---------------------------------------------------------------------------
# CDC tombstone compaction audit — the GC half of cdc_merge_parquet
# ---------------------------------------------------------------------------

from .queries_ext4 import _CDC_LOG_SQL  # noqa: E402

# A SECOND delete wave (keys % 5, seq 5) on top of the shared base
# changelog: at horizon 4 the base wave's tombstones (seq 3 — below the
# horizon, unredeliverable) are GC'd while the late wave's (seq 5) are
# retained, so the audit exercises BOTH branches of the GC predicate.
_CDC_GC_ORACLE = f"""
    WITH {_CDC_LOG_SQL},
    log2 AS (
      SELECT * FROM log
      UNION ALL
      SELECT o_orderkey, 5, 'D', NULL, NULL
      FROM orders WHERE o_orderkey % 5 = 0
    ),
    latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY okey ORDER BY seq DESC) AS rn
        FROM log2
      ) WHERE rn = 1
    ),
    compacted AS (
      SELECT * FROM latest WHERE op <> 'D' OR seq >= 4
    )
    SELECT op AS last_op, seq AS last_seq,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(totalprice) AS BIGINT) AS n_live_payloads
    FROM compacted
    GROUP BY 1, 2
    """


@register(
    "cdc_tombstone_gc_audit",
    _CDC_GC_ORACLE,
    survey="§2.2 K5+CDC extension (verdict r06 item 7): tombstone GC at a "
    "redelivery horizon — collapse the orders changelog WITH tombstones "
    "retained, apply the horizon filter, audit survivors by op; the "
    "catalog twin of sinks.compact_cdc_tombstones' pure filter",
    tags=("ext", "cdc"),
)
def cdc_tombstone_gc_audit(spark, sf_dir):
    """The tombstone-GC semantics as one lazy plan (test_cdc pins the
    stateful on-disk sink path): collapse the synthetic orders changelog —
    base waves plus a LATE delete wave at seq 5 — keeping tombstones, drop
    tombstones below redelivery horizon 4, audit what the compacted table
    stores per (op, seq).

    Plan: the same ONE okey-keyed window as cdc_apply_orders; the GC is a
    pure filter on the survivors (no extra shuffle — exactly the property
    that makes compaction cheap at 100 TB), then an output-sized audit
    aggregate. The seq-3 tombstones vanish (below horizon), the seq-5
    ones survive, and ``n_live_payloads`` proves tombstones carry no
    payload through GC.
    """
    from .operators import cdc as C
    from .queries_ext4 import build_orders_changelog

    base = build_orders_changelog(lambda: t(spark, sf_dir, "orders"))
    late_dels = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 5 == 0)
        .select(
            F.col("o_orderkey").alias("okey"),
            F.lit(5).alias("seq"),
            F.lit("D").alias("op"),
            F.lit(None).cast("double").alias("totalprice"),
            F.lit(None).cast("string").alias("status"),
        )
    )
    with_tombstones = C.apply_changelog(
        base.unionByName(late_dels),
        keys=["okey"],
        order_by=[F.col("seq")],
        keep_deletes=True,
    )
    horizon = 4
    compacted = with_tombstones.filter(
        (F.col("op") != "D") | (F.col("seq") >= horizon)
    )
    return compacted.groupBy(
        F.col("op").alias("last_op"), F.col("seq").alias("last_seq")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("totalprice").alias("n_live_payloads"),
    )


# ---------------------------------------------------------------------------
# Triangle census of the near-dup similarity graph
# ---------------------------------------------------------------------------


def _triangle_oracle() -> str:
    """Naive a<b<c three-way self-join — the orientation-free exact twin
    of operators/graph.triangle_stats (the count is orientation-
    independent, so the oracle needs no degree ordering)."""
    from .queries_ext import _JACCARD_ORACLE

    return f"""
    WITH pairs AS ({_JACCARD_ORACLE.format(thr=0.5)}),
    e AS (
      SELECT DISTINCT least(doc_a, doc_b) AS a, greatest(doc_a, doc_b) AS b
      FROM pairs WHERE doc_a <> doc_b
    ),
    v AS (SELECT a AS x FROM e UNION SELECT b FROM e),
    tri AS (
      SELECT count(*) AS t
      FROM e e1
      JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
    )
    SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_vertices,
           CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles
    """


@register(
    "near_dup_triangle_census",
    _triangle_oracle(),
    survey="§7 north-star: degree-ordered triangle counting over the "
    "near-dup similarity graph (Suri–Vassilvitskii) — wedge fanout "
    "bounded by oriented out-degree O(√m), the last-reducer hub killer; "
    "density probe for boilerplate near-cliques before keep-list "
    "collapse",
    tags=("ext", "dedup", "graph"),
)
def near_dup_triangle_census(spark, sf_dir):
    """Triangle census of the minhash-mined near-dup graph (the same
    shared pair stage PageRank and the CC keep-lists consume)."""
    from .operators.graph import triangle_stats
    from .queries_ext import _minhash_pair_stage

    pairs = _minhash_pair_stage(spark, sf_dir)
    return triangle_stats(pairs, "doc_a", "doc_b")


# ---------------------------------------------------------------------------
# Per-source weighted sampling — stratified Efraimidis–Spirakis
# ---------------------------------------------------------------------------


@register(
    "per_source_weighted_sample",
    """
    WITH keyed AS (
      SELECT doc_id, source, n_chars AS weight,
             round(
               ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) + 1) / 4294967296.0)
               * 1000000.0 / n_chars, 6) AS sample_key
      FROM documents
      WHERE n_chars > 0
    )
    SELECT doc_id, source, weight, sample_key,
           CAST(row_number() OVER (PARTITION BY source
                                   ORDER BY sample_key DESC, doc_id)
                AS INTEGER) AS src_rank
    FROM keyed
    QUALIFY src_rank <= 20
    """,
    survey="§7 Phase 5 extension: STRATIFIED weighted sampling without "
    "replacement — per-source A-Res (key = ln(u)/w, deterministic md5 "
    "uniforms) under a hard per-source count; the weighted-randomness "
    "twin of per_source_quality_quota's quality ranking, composing "
    "domain balancing with length-weighted selection in ONE source-keyed "
    "window (WindowGroupLimit forwards ≤k rows per source per map task)",
    tags=("ext", "assembly"),
)
def per_source_weighted_sample(spark, sf_dir):
    """Top-20 weighted sample PER SOURCE, weight = ``n_chars``.

    Corpus mixing needs both knobs at once: per-domain caps (so one
    crawl cannot dominate) and weighted randomness within the domain (so
    the cap keeps a diverse, length-tilted draw instead of always the
    same longest documents). A-Res makes that one window: the per-row
    key ``ln(u)/w`` is a pure function of the stable id (md5 uniform —
    reproducible across runs, partitionings, and engines; same contract
    as ``weighted_doc_sample``), and the per-source top-k is ONE
    source-keyed exchange with the rank filter pushed below it as
    WindowGroupLimit — a hot source costs what every source costs.
    Zero-weight rows are excluded on both engines (A-Res requires w > 0).
    """
    docs = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    from pyspark.sql import Window

    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        + 1
    ) / F.lit(4294967296.0)
    keyed = docs.select(
        "doc_id",
        "source",
        F.col("n_chars").alias("weight"),
        F.round(F.log(u) * 1000000.0 / F.col("n_chars"), 6).alias("sample_key"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("sample_key").desc(), "doc_id"
    )
    return keyed.withColumn("src_rank", F.row_number().over(w)).filter(
        F.col("src_rank") <= 20
    )


# ---------------------------------------------------------------------------
# Incremental NEAR-dup dedup against a stored MinHash band index
# ---------------------------------------------------------------------------


def _incr_near_dup_oracle() -> str:
    """A new-batch doc (doc_id % 10 >= 8) is admitted iff it has no
    exact-Jaccard->=t partner among stored docs or lower-id batch docs.
    Exact Jaccard stands in for the band index because the (16, 8)
    banding has measured 100% recall on this corpus (the same
    equivalence `minhash_lsh_near_dups`' oracle already pins)."""
    from .queries_ext import _SHINGLES, _TOKS

    return f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS l FROM documents
    ),
    sh AS (
      SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM toks
    ),
    sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE round(CAST(inter AS DOUBLE)
                  / (sa.set_size + sb.set_size - inter), 4) >= 0.5
    ),
    batch AS (SELECT doc_id FROM documents WHERE doc_id % 10 >= 8),
    rejected AS (
      -- dominated by ANY lower-id partner (stored or batch: pairs have
      -- doc_a < doc_b, so doc_b = n covers both), or by a stored
      -- HIGHER-id partner (doc_a = n with a non-batch doc_b)
      SELECT DISTINCT n.doc_id
      FROM batch n JOIN pairs p
        ON p.doc_b = n.doc_id
        OR (p.doc_a = n.doc_id AND p.doc_b % 10 < 8)
    )
    SELECT doc_id FROM batch
    WHERE doc_id NOT IN (SELECT doc_id FROM rejected)
    """


@register(
    "incremental_near_dup_new_docs",
    _incr_near_dup_oracle(),
    survey="§7 Phase 5 extension: incremental NEAR-dup admission against "
    "a persisted MinHash band index — band the BATCH only, join it to "
    "the stored (doc_id, band_key) relation, exact-verify candidates; "
    "the growing-corpus production shape next to the exact-fingerprint "
    "incremental tier (each increment is O(batch), never a corpus "
    "re-scan)",
    tags=("ext", "dedup"),
)
def incremental_near_dup_new_docs(spark, sf_dir):
    """Admit the doc_id % 10 ∈ {8, 9} batch against the rest of the
    corpus as the historical store: the band index is derived here from
    the stored docs (in production it accretes across increments —
    append ``minhash_band_rows`` of each admitted batch)."""
    from .operators import dedup as D

    docs = spread(t(spark, sf_dir, "documents"))
    new = docs.filter(F.col("doc_id") % 10 >= 8)
    stored = docs.filter(F.col("doc_id") % 10 < 8)
    return D.incremental_minhash_dedup(
        new, D.minhash_band_rows(stored), stored, threshold=0.5
    )


# ---------------------------------------------------------------------------
# Containment (subset-duplication) mining — Broder's asymmetric measure
# ---------------------------------------------------------------------------


def _containment_oracle(thr: float) -> str:
    from .queries_ext import _SHINGLES, _TOKS

    return f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS l FROM documents
    ),
    sh AS (
      SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM toks
    ),
    sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(inter AS DOUBLE) / sa.set_size, 4) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    WHERE round(CAST(inter AS DOUBLE) / sa.set_size, 4) >= {thr}
    """


@register(
    "containment_dups",
    _containment_oracle(0.6),
    survey="§7 Phase 5 extension: asymmetric shingle CONTAINMENT pairs "
    "(|A∩B|/|A| ≥ t, Broder's measure) — catches subset duplication "
    "(fragment quoted inside a longer doc) that symmetric Jaccard "
    "misses; same single-exchange inverted-index plan as jaccard_pairs "
    "plus the |B| ≥ t·|A| candidate bound pruned before the pair "
    "aggregation",
    tags=("ext", "dedup"),
)
def containment_dups(spark, sf_dir):
    """Ordered near-containment pairs at t = 0.6 over the documents
    corpus (both orientations of a fragment/whole pair can appear; a
    doc-a-mostly-inside-doc-b hit says drop or span-trim doc_a). The
    catalog entry opts into the absolute stop-shingle cap exactly like
    ``jaccard_near_dups`` — no shingle crosses it on the sf fixtures, so
    the result is bit-identical to the exact oracle join."""
    from .operators import dedup as D

    docs = spread(t(spark, sf_dir, "documents"))
    return D.containment_pairs(
        docs, threshold=0.6, stop_max_df_frac=0.2, stop_min_df=64
    )


# ---------------------------------------------------------------------------
# BM25 retrieval over the inverted index — the lexical ranking tier
# ---------------------------------------------------------------------------


def _bm25_oracle() -> str:
    from .queries_ext import _TOKS

    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS token FROM documents
    ),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM dl
    ),
    dft AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
    q AS (
      SELECT DISTINCT doc_id AS query_id, token FROM tf WHERE doc_id < 20
    ),
    terms AS (
      SELECT q.query_id, tf.doc_id AS neighbor_id,
             CAST(round(
               ln((s.n - dft.df + 0.5) / (dft.df + 0.5) + 1.0)
               * (tf.tf * 2.2)
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)),
               4) AS DECIMAL(18,4)) AS w
      FROM q
      JOIN tf ON tf.token = q.token
      JOIN dft ON dft.token = q.token
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      WHERE tf.doc_id <> q.query_id
    ),
    agg AS (
      SELECT query_id, neighbor_id, sum(w) AS score_dec
      FROM terms GROUP BY 1, 2
    ),
    rk AS (
      SELECT query_id, neighbor_id,
             CAST(score_dec AS DOUBLE) AS score,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY score_dec DESC, neighbor_id
             ) AS rank
      FROM agg
    )
    SELECT query_id, neighbor_id, score, rank FROM rk WHERE rank <= 5
    """


@register(
    "bm25_doc_topk",
    _bm25_oracle(),
    survey="§7 north-star: BM25 top-k retrieval (Robertson/Okapi with "
    "the Lucene +1 idf, k1=1.2 b=0.75) through the same inverted-index "
    "postings join as tfidf_cosine_topk — per-term weights rounded to "
    "DECIMAL(18,4) BEFORE summation so scores and the rank order are "
    "exact and partition-order-invariant cross-engine",
    tags=("ext", "similarity", "text"),
)
def bm25_doc_topk(spark, sf_dir):
    """BM25 top-5 neighbors for the first-20-doc probe slice. Everything
    flows through the postings join (cost Σ_token probe_df × df, never
    |docs|²): tf and doc length ride the postings, document frequency
    and the corpus stats (N, avgdl — avgdl derived as exact-integer
    sum(dl)/count so both engines compute the identical double) join in,
    and the per-(query, doc, term) weight is rounded to 4 dp and cast to
    decimal BEFORE the per-pair summation — float summation order never
    enters, and the rank window ties-break on neighbor_id. At 100 TB the
    probe side is a broadcast query workload; hot tokens df-cap exactly
    like jaccard_pairs' stop-shingle cap.

    Stage sharing — measured, deliberately NOT applied here: ``tf`` feeds
    four consumers, and `tfidf_cosine_topk` materializes its shared
    relations for a 1.7× sf1 win, so the same treatment was tried here
    and measured SLOWER (sf1 5.5 s recompute vs 10.5 s checkpointed,
    same session, 48g scale harness). The asymmetry: tfidf's reused
    relation embeds a token-keyed shuffle JOIN (re-run per consumer
    unless materialized), while every bm25 consumer is a map-side-
    combined aggregation over scan→explode lineage — recomputing that is
    cheaper than writing + re-reading the full postings, and
    materializing ``tf`` also forfeits the probe slice's ``doc_id < 20``
    parquet pushdown (the filter reaches the scan only while the lineage
    is live). At 100 TB the index IS persisted, but as a bucketed table
    built once across queries — not per-query inside this plan."""
    from pyspark.sql import Window

    from .operators import text as X

    docs = spread(t(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(X.tokens(F.col("text"))).alias("token")
    )
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("double").alias("n"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    dft = tf.groupBy("token").agg(F.count("*").alias("df"))
    q = (
        tf.filter(F.col("doc_id") < 20)
        .select(F.col("doc_id").alias("query_id"), "token")
        .distinct()
    )
    idf = F.log(
        (F.col("n") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tfnorm = (F.col("tf") * F.lit(2.2)) / (
        F.col("tf")
        + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.col("avgdl"))
    )
    terms = (
        q.join(tf.withColumnRenamed("doc_id", "neighbor_id"), "token")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        # dft joins on the token key the postings join already shuffled
        # by (vocabulary is unbounded at corpus scale — never broadcast)
        .join(dft, "token")
        .join(dl.withColumnRenamed("doc_id", "neighbor_id"), "neighbor_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "neighbor_id",
            F.round(idf * tfnorm, 4).cast("decimal(18,4)").alias("w"),
        )
    )
    agg = terms.groupBy("query_id", "neighbor_id").agg(
        F.sum("w").alias("score_dec")
    )
    wr = Window.partitionBy("query_id").orderBy(
        F.col("score_dec").desc(), "neighbor_id"
    )
    return (
        agg.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            F.col("score_dec").cast("double").alias("score"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered incremental dedup — the bounded-metadata probe path
# ---------------------------------------------------------------------------

# History/batch split shared by the batch entry AND its streaming twin
# (stream_bloom_dedup, queries_stream.py) — one definition so the two
# entries can never silently drift apart (review finding r07). The SQL
# fragment defines the fp + idx CTEs; the Spark helper returns the same
# split relationally.
BLOOM_SPLIT_SRC = 15

_BLOOM_SPLIT_SQL = f"""fp AS (
      SELECT doc_id, source, md5({_NORM}) AS fp FROM documents
    ),
    idx AS (SELECT DISTINCT fp FROM fp
            WHERE CAST(substr(source, 4) AS BIGINT) < {BLOOM_SPLIT_SRC})"""


def bloom_split(spark, sf_dir):
    """(index_fps, new_docs) for the shared history/batch split."""
    from .operators.text import fingerprint

    docs = spread(t(spark, sf_dir, "documents"))
    src_n = F.substring("source", 4, 10).cast("long")
    index_fps = docs.filter(src_n < BLOOM_SPLIT_SRC).select(
        fingerprint("text").alias("fp")
    )
    return index_fps, docs.filter(src_n >= BLOOM_SPLIT_SRC)


@register(
    "bloom_dedup_new_docs",
    f"""
    WITH {_BLOOM_SPLIT_SQL},
    new AS (SELECT doc_id, fp FROM fp
            WHERE CAST(substr(source, 4) AS BIGINT) >= {BLOOM_SPLIT_SRC}),
    keeper AS (SELECT fp, min(doc_id) AS doc_id FROM new GROUP BY 1)
    SELECT k.doc_id, k.fp
    FROM keeper k
    WHERE NOT EXISTS (SELECT 1 FROM idx WHERE idx.fp = k.fp)
    """,
    survey="§7 Phase 5 / §2.2 K5 shape: Bloom-prefiltered incremental "
    "dedup — the batch probes a packed (word_idx, bits) Bloom relation "
    "(bounded by the bit budget, not index cardinality) and only "
    "probable hits pay the exact anti-join; false positives re-verify "
    "exactly, so the admitted set is IDENTICAL to the plain anti-join "
    "(which is the oracle). The 100 TB shape for a daily batch vs a "
    "10⁹-row fingerprint index",
    tags=("ext", "dedup"),
)
def bloom_dedup_new_docs(spark, sf_dir):
    from .operators.dedup import bloom_incremental_exact_dedup

    index_fps, new_docs = bloom_split(spark, sf_dir)
    return bloom_incremental_exact_dedup(
        new_docs,
        index_fps,
        num_bits=1 << 17,
        num_hashes=4,
    )


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing (n^alpha smoothing, alpha = 0.5)
# ---------------------------------------------------------------------------


@register(
    "temperature_mixture_sample",
    f"""
    WITH b AS (
      SELECT source,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                  AS BIGINT) AS bucket,
             n_chars,
             len({_TOKS}) AS n_tokens
      FROM documents
    ),
    c AS (SELECT source,
                 CAST(count(*) AS BIGINT) AS total_docs,
                 CAST(sum(n_chars) AS BIGINT) AS total_chars
          FROM b GROUP BY 1),
    mn AS (SELECT min(total_chars) AS m FROM c),
    r AS (SELECT source, total_docs, total_chars,
                 sqrt(CAST(m AS DOUBLE) / total_chars) AS p
          FROM c, mn)
    SELECT b.source,
           r.total_docs,
           r.total_chars,
           CAST(count(*) FILTER (WHERE bucket < p * 65536) AS BIGINT)
             AS sampled_docs,
           CAST(COALESCE(
             sum(n_tokens) FILTER (WHERE bucket < p * 65536), 0) AS BIGINT)
             AS sampled_tokens,
           CAST(floor(p * 1000000) AS BIGINT) AS rate_ppm
    FROM b JOIN r USING (source)
    GROUP BY 1, r.total_docs, r.total_chars, r.p
    """,
    survey="§7 Phase 5: temperature-scaled source mixing — per-source "
    "keep rate (m/size_s)^(1-alpha) with alpha=0.5 over source CHAR "
    "MASS (exponential smoothing over source sizes, the "
    "multilingual-corpus standard: big sources down-weighted, the "
    "smallest kept whole) applied via the stable md5 bucket; alpha=0.5 "
    "makes the rate a single IEEE sqrt, bit-identical cross-engine "
    "where a general pow is not guaranteed",
    tags=("ext", "text"),
)
def temperature_mixture_sample(spark, sf_dir):
    from .operators import text as X

    docs = spread(t(spark, sf_dir, "documents"))
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    # One corpus scan: aggregate per (source, bucket) FIRST — the
    # aggregate is bounded by sources x 65536 regardless of corpus size,
    # map-side combined — then derive counts, the global min, and the
    # temperature rates on that bounded relation only.
    per_bucket = (
        docs.select(
            "source",
            bucket.alias("bucket"),
            "n_chars",
            F.size(X.tokens("text")).alias("n_tokens"),
        )
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars"),
            F.sum("n_tokens").cast("long").alias("tok"),
        )
    )
    counts = per_bucket.groupBy("source").agg(
        F.sum("n_docs").cast("long").alias("total_docs"),
        F.sum("chars").cast("long").alias("total_chars"),
    )
    mn = counts.agg(F.min("total_chars").alias("m"))
    rated = counts.crossJoin(F.broadcast(mn)).select(
        "source",
        "total_docs",
        "total_chars",
        F.sqrt(F.col("m").cast("double") / F.col("total_chars")).alias("p"),
    )
    return (
        per_bucket.join(F.broadcast(rated), "source")
        .groupBy("source", "total_docs", "total_chars", "p")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("bucket") < F.col("p") * 65536, F.col("n_docs"))),
                F.lit(0),
            )
            .cast("long")
            .alias("sampled_docs"),
            F.coalesce(
                F.sum(F.when(F.col("bucket") < F.col("p") * 65536, F.col("tok"))),
                F.lit(0),
            )
            .cast("long")
            .alias("sampled_tokens"),
        )
        .select(
            "source",
            "total_docs",
            "total_chars",
            "sampled_docs",
            "sampled_tokens",
            F.floor(F.col("p") * 1000000).cast("long").alias("rate_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Edit-distance near-dups (Ed-Join) — character-level fuzzy matching,
# the verification modality token-shingle Jaccard cannot express
# ---------------------------------------------------------------------------


@register(
    "edit_distance_near_dups",
    # Oracle = brute-force length-pruned levenshtein over the SAME ASCII
    # projection — semantically independent of the Spark plan (no prefix
    # filter, no bucketing), so a hash match certifies the Ed-Join
    # candidate theorem end-to-end, not a shared bug. `|len_a - len_b|
    # <= d` is the one prune the oracle shares, and it is a theorem
    # (ed >= length difference). Projection note: DuckDB's levenshtein
    # counts UTF-8 BYTES, Spark's counts codepoints; on the ASCII
    # projection bytes == codepoints, making the distance engine-exact
    # (operators/dedup.py ascii_projected).
    r"""
    WITH p AS (
      SELECT doc_id, regexp_replace(text, '[^\x00-\x7F]', '?', 'g') AS t
      FROM documents
    ),
    c AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             levenshtein(a.t, b.t) AS ed
      FROM p a JOIN p b
        ON a.doc_id < b.doc_id
       AND abs(length(a.t) - length(b.t)) <= 24
    )
    SELECT doc_a, doc_b, CAST(ed AS BIGINT) AS edit_distance
    FROM c WHERE ed <= 24
    """,
    survey="§7 Phase 5: edit-distance near-dups — Ed-Join prefix filtering "
    "(d·q+1 rarest char-3-gram occurrences as join keys, recall 1 by the "
    "multiset q-gram lemma), length-bucket blocking for the short band "
    "where the lemma is vacuous, banded JVM levenshtein(l, r, d) verify",
    tags=("ext", "dedup"),
)
def edit_distance_near_dups(spark, sf_dir):
    from .operators.dedup import edit_distance_pairs

    return edit_distance_pairs(spread(t(spark, sf_dir, "documents")), d=24)


# ---------------------------------------------------------------------------
# DSIR importance resampling — domain-matched data selection
# ---------------------------------------------------------------------------

_DSIR_TARGET = "('src0', 'src1', 'src2', 'src3')"
_DSIR_BUCKETS = 1024

_DSIR_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, source IN {_DSIR_TARGET} AS is_target,
             unnest({_TOKS}) AS token
      FROM documents
    ),
    db AS (
      SELECT doc_id, is_target,
             CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT)
               % {_DSIR_BUCKETS} AS bucket,
             count(*) AS cnt
      FROM tok GROUP BY 1, 2, 3
    ),
    dist AS (
      SELECT bucket,
             SUM(CASE WHEN is_target THEN cnt ELSE 0 END) AS cnt_t,
             SUM(CASE WHEN NOT is_target THEN cnt ELSE 0 END) AS cnt_r
      FROM db GROUP BY 1
    ),
    tot AS (
      SELECT CAST(SUM(cnt_t) AS DOUBLE) AS tot_t,
             CAST(SUM(cnt_r) AS DOUBLE) AS tot_r
      FROM dist
    ),
    lam AS (
      SELECT bucket,
             CAST(round(
               ln((cnt_t + 1.0) / (tot_t + {_DSIR_BUCKETS}.0))
               - ln((cnt_r + 1.0) / (tot_r + {_DSIR_BUCKETS}.0)), 4)
             AS DECIMAL(18,4)) AS lam
      FROM dist CROSS JOIN tot
    ),
    w AS (
      SELECT db.doc_id, SUM(db.cnt * lam.lam) AS weight_dec
      FROM db JOIN lam USING (bucket)
      WHERE NOT db.is_target
      GROUP BY 1
    ),
    rk AS (
      SELECT doc_id, CAST(weight_dec AS DOUBLE) AS dsir_weight,
             row_number() OVER (ORDER BY weight_dec DESC, doc_id) AS rank
      FROM w
    )
    SELECT doc_id, dsir_weight, rank FROM rk WHERE rank <= 200
    """


@register(
    "dsir_importance_resample",
    _DSIR_ORACLE,
    survey="§7 north-star: DSIR data selection (Xie et al. NeurIPS'23) — "
    "hashed-unigram importance weights ln(p_target/p_raw) over a FIXED "
    "1024-bucket feature space, per-bucket log-ratios rounded to "
    "DECIMAL(18,4) before the per-doc summation (exact, order-invariant), "
    "top-200 resample as TakeOrderedAndProject",
    tags=("ext", "text", "sampling"),
)
def dsir_importance_resample(spark, sf_dir):
    """Select the 200 raw-corpus documents whose hashed token profile
    best matches the target domain (sources src0-src3), by DSIR
    log-likelihood-ratio weight.

    All heavy lifting is in :func:`operators.text.dsir_weights` (bucket
    distributions are bounded by the fixed feature space and broadcast
    back; the token stream is never shuffled by token). The selection
    itself is ``orderBy(weight).limit(200)`` — TakeOrderedAndProject, a
    per-partition top-k + single-reduce, no global sort — and the rank
    column is a window over the already-cut 200 rows, the same
    post-limit idiom the r06 verdict pinned for weighted_doc_sample."""
    from pyspark.sql import Window

    from .operators import text as X

    docs = spread(t(spark, sf_dir, "documents"))
    w = X.dsir_weights(
        docs,
        F.col("source").isin("src0", "src1", "src2", "src3"),
        n_buckets=_DSIR_BUCKETS,
    )
    top = w.orderBy(F.col("weight_dec").desc(), "doc_id").limit(200)
    wr = Window.orderBy(F.col("weight_dec").desc(), "doc_id")
    return (
        top.withColumn("rank", F.row_number().over(wr))
        .select(
            "doc_id",
            F.col("weight_dec").cast("double").alias("dsir_weight"),
            "rank",
        )
    )


# ---------------------------------------------------------------------------
# Product-quantized ANN — ADC over integer-lattice codes
# ---------------------------------------------------------------------------

_PQ_ORACLE = """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT)) AS q
      FROM embeddings
    ),
    params AS (SELECT CAST(len(q) // 8 AS BIGINT) AS d FROM v LIMIT 1),
    anch AS (
      SELECT row_number() OVER (
               ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS code,
             q
      FROM v
      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
      LIMIT 256
    ),
    idx AS (
      SELECT CAST((j - 1) // d AS INT) AS s, j
      FROM (SELECT unnest(range(1, p.d * 8 + 1)) AS j, p.d AS d
            FROM params p)
    ),
    cd AS (
      SELECT v.vec_id, a.code, idx.s,
             CAST(SUM((v.q[idx.j] - a.q[idx.j])
                      * (v.q[idx.j] - a.q[idx.j])) AS BIGINT) AS dist
      FROM v CROSS JOIN anch a CROSS JOIN idx
      GROUP BY 1, 2, 3
    ),
    codes AS (
      SELECT vec_id, s, code
      FROM (SELECT vec_id, s, code,
                   row_number() OVER (
                     PARTITION BY vec_id, s ORDER BY dist, code) AS rn
            FROM cd)
      WHERE rn = 1
    ),
    adc AS (
      SELECT l.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(SUM(l.dist) AS BIGINT) AS adc
      FROM codes c
      JOIN cd l ON l.s = c.s AND l.code = c.code AND l.vec_id < 20
      WHERE c.vec_id <> l.vec_id
      GROUP BY 1, 2
    ),
    cands AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (
               PARTITION BY query_id ORDER BY adc, neighbor_id) AS crank
      FROM adc
    ),
    exact AS (
      SELECT query_id, neighbor_id,
             round(list_cosine_similarity(qv.e, cv.e), 4) AS cos_sim
      FROM cands
      JOIN v qv ON qv.vec_id = query_id
      JOIN v cv ON cv.vec_id = neighbor_id
      WHERE crank <= 20
    )
    SELECT query_id, neighbor_id, cos_sim,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos_sim DESC, neighbor_id) AS rank
    FROM exact
    QUALIFY rank <= 5
    """


@register(
    "pq_adc_topk",
    _PQ_ORACLE,
    survey="§7 Phase 5: product-quantized ANN (Jégou et al. TPAMI'11) — "
    "the fourth tier next to LSH/IVF/SQ8: m=8 sub-codebooks × 256 codes "
    "= 8 bytes/vector (32× vs float32); EXACT int64 lattice assignment "
    "+ ADC candidate cut (engine-portable by construction, the sq8 "
    "integer-cut guarantee), k·4 candidates re-ranked with exact cosine",
    tags=("ext", "similarity"),
)
def pq_adc_topk(spark, sf_dir):
    """PQ/ADC top-5 for the first-20-vector probe slice (the shared ANN
    probe convention). The hash-ordered anchor codebook, integer-lattice
    assignment, per-query LUTs, and the ADC sum are all exact int64 —
    see :func:`operators.similarity.pq_topk`; the DuckDB oracle re-derives
    the identical codebook and codes from the same md5 order, with the
    subspace count's dims derived from the vector length (advice r06:
    never hardcode the fixture dimensionality)."""
    from .operators import similarity as S

    emb = spread(t(spark, sf_dir, "embeddings"))
    return S.pq_topk(
        corpus=emb, queries=emb.filter(F.col("vec_id") < 20), k=5, rerank=4
    )


# ---------------------------------------------------------------------------
# Exact substring dedup REWRITE (Lee et al. 2022) — the removal op the
# span_dedup_coverage audit promises
# ---------------------------------------------------------------------------

_SPAN_REWRITE_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, {_TOKS} AS l, len({_TOKS}) AS T FROM documents
    ),
    spans AS (
      SELECT doc_id,
             unnest(range(0, greatest(T - 7, 0))) AS p,
             unnest(list_transform(range(0, greatest(T - 7, 0)),
                    q -> array_to_string(l[q + 1 : q + 8], ' '))) AS span
      FROM tok
    ),
    occ AS (
      SELECT doc_id, p,
             count(*) OVER (PARTITION BY span) AS c,
             row_number() OVER (PARTITION BY span ORDER BY doc_id, p) AS rn
      FROM spans
    ),
    rem AS (SELECT doc_id, p AS s, p + 7 AS e FROM occ WHERE c > 1 AND rn > 1),
    covered AS (
      SELECT DISTINCT doc_id, unnest(range(s, e + 1)) AS idx FROM rem
    ),
    tokrows AS (
      SELECT doc_id, unnest(range(0, T)) AS idx, unnest(l) AS tk FROM tok
    ),
    kept AS (
      SELECT tr.doc_id, tr.idx, tr.tk
      FROM tokrows tr
      LEFT JOIN covered c ON tr.doc_id = c.doc_id AND tr.idx = c.idx
      WHERE c.idx IS NULL
    )
    SELECT t.doc_id,
           CAST(t.T AS BIGINT) AS n_tokens,
           CAST(t.T - count(k.idx) AS BIGINT) AS n_removed,
           coalesce(string_agg(k.tk, ' ' ORDER BY k.idx), '') AS cleaned_text
    FROM tok t LEFT JOIN kept k ON t.doc_id = k.doc_id
    GROUP BY t.doc_id, t.T
    """


@register(
    "span_dedup_rewrite",
    _SPAN_REWRITE_ORACLE,
    survey="§7 Phase 5: exact substring dedup that rewrites the corpus "
    "(Lee et al. 2022) — every duplicated word 8-gram keeps its globally "
    "first occurrence and is cut everywhere else, overlapping spans "
    "merging into removed islands; the removal op span_dedup_coverage "
    "audits (exact-duplicate docs return cleaned_text = '')",
    tags=("ext", "dedup"),
)
def span_dedup_rewrite(spark, sf_dir):
    """One row per document: doc_id, n_tokens, n_removed, cleaned_text.
    Plan: span stats aggregate FIRST, SHUFFLE_HASH join back, collapse to
    one doc-keyed merged-interval row, then scan-side higher-order-filter
    reconstruction — the token relation is never shuffled (see
    :func:`operators.dedup.span_dedup_rewrite`)."""
    from .operators import dedup as D

    return D.span_dedup_rewrite(spread(t(spark, sf_dir, "documents")), n=8)
