"""Extension catalog, batch 2: corpus-hygiene operators a web-scale
training-data pipeline runs between crawl and tokenizer — repetition
filtering (Gopher), exact span dedup (C4/RefinedWeb), frequency heavy
hitters, PII-style redaction, and the composed keep/drop quality gate.

Same registry/oracle conventions as queries_ext.py (tokenization canon,
exact-integer parts with one final double division, md5-only visible
hashes).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import dedup as D
from .operators import text as X
from .queries import read_events, register, spread, t
from .queries_ext import _NORM, _TOKS

# Stopword-hit fragments bound to the shared ``toks`` CTE column (the
# queries_ext._HITS twins re-tokenize from ``text``, which the CTE drops).
_HITS_T = {
    lang: "len(list_filter(toks, x -> lower(x) IN ({words})))".format(
        words=", ".join(f"'{w}'" for w in X.STOPWORDS[lang])
    )
    for lang in X.STOPWORDS
}

# Token-array CTE shared by the oracles below (DuckDB list indexing is
# 1-based and negative slice bounds wrap, hence the greatest() guards).
_L = (
    "SELECT doc_id, lang, source, "
    f"{_TOKS} AS toks FROM documents"
)


@register(
    "doc_repetition_scores",
    f"""
    WITH l AS ({_L}),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM l),
    tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
    ts AS (SELECT doc_id,
                  CAST(sum(c) AS BIGINT) AS n_tokens,
                  CAST(count(*) AS BIGINT) AS n_distinct_tokens,
                  CAST(max(c) AS BIGINT) AS top_c
           FROM tc GROUP BY 1),
    bgl AS (SELECT doc_id,
                   unnest(list_transform(toks[1:greatest(len(toks)-1, 0)],
                          (x, i) -> x || ' ' || toks[i+1])) AS bg
            FROM l),
    bc AS (SELECT doc_id, bg, count(*) AS c FROM bgl GROUP BY 1, 2),
    bs AS (SELECT doc_id,
                  CAST(sum(c) AS BIGINT) AS n_bigrams,
                  CAST(count(*) AS BIGINT) AS n_distinct_bigrams
           FROM bc GROUP BY 1)
    SELECT ts.doc_id,
           ts.n_tokens,
           ts.n_distinct_tokens,
           CAST(ts.top_c AS DOUBLE) / ts.n_tokens AS top_token_fraction,
           CASE WHEN bs.n_bigrams > 0
                THEN CAST(bs.n_bigrams - bs.n_distinct_bigrams AS DOUBLE)
                     / bs.n_bigrams
           END AS dup_bigram_fraction
    FROM ts LEFT JOIN bs ON ts.doc_id = bs.doc_id
    """,
    survey="§7 Phase 5: Gopher-style repetition filters — top-token share + duplicate-bigram share per doc (explode + codegen hash-agg, never per-row array folds)",
    tags=("ext", "text"),
)
def doc_repetition_scores(spark, sf_dir):
    return X.repetition_stats(spread(t(spark, sf_dir, "documents")))


@register(
    "heavy_hitter_tokens",
    f"""
    SELECT tok AS token, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest({_TOKS}) AS tok FROM documents)
    GROUP BY 1
    ORDER BY cnt DESC, token
    LIMIT 20
    """,
    survey="§7 Phase 5: exact corpus heavy hitters (map-side-combined agg + TakeOrderedAndProject top-k); approximate one-pass sibling DataFrame.freqItems superset-pinned in test_text_ops",
    tags=("ext", "text"),
)
def heavy_hitter_tokens(spark, sf_dir):
    return X.heavy_hitter_tokens(spread(t(spark, sf_dir, "documents")), k=20)


_SPAN8 = (
    "list_transform(toks[1:greatest(len(toks)-7, 0)], (x, i) -> "
    + " || ' ' || ".join(["x"] + [f"toks[i+{j}]" for j in range(1, 8)])
    + ")"
)


@register(
    "span_dedup_coverage",
    f"""
    WITH l AS ({_L}),
    sp AS (SELECT doc_id, unnest({_SPAN8}) AS span FROM l),
    gc AS (SELECT span, count(*) AS global_c FROM sp GROUP BY 1)
    SELECT sp.doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN gc.global_c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_spans,
           CAST(sum(CASE WHEN gc.global_c > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS dup_span_fraction
    FROM sp JOIN gc USING (span)
    GROUP BY 1
    """,
    survey="§7 Phase 5: C4/RefinedWeb exact span dedup audit — positional word 8-grams, global occurrence counts joined back, per-doc duplicated fraction",
    tags=("ext", "dedup"),
)
def span_dedup_coverage(spark, sf_dir):
    return D.span_dup_coverage(spread(t(spark, sf_dir, "documents")), n=8)


@register(
    "props_redaction_audit",
    r"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(len(regexp_extract_all(props, '-?\d+(?:\.\d+)?')))
                AS BIGINT) AS n_redacted,
           CAST(sum(CASE WHEN len(regexp_extract_all(props, '-?\d+(?:\.\d+)?')) > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS rows_with_pii,
           CAST(count(DISTINCT regexp_replace(props, '-?\d+(?:\.\d+)?', '<NUM>', 'g'))
                AS BIGINT) AS n_templates
    FROM events
    GROUP BY 1
    """,
    survey="§7 Phase 5 / §2.3 P8: PII-style numeric redaction over the JSONB-ish props column — regexp scrub + per-type audit (redaction counts, template cardinality)",
    tags=("ext", "text"),
)
def props_redaction_audit(spark, sf_dir):
    ev = read_events(spark, sf_dir).select("event_type", "props")
    return X.redaction_stats(spread(ev), col="props", group_by="event_type")


def _gated_docs(docs):
    """Per-doc gate frame: (doc_id, lang, source, n_tokens,
    top_token_fraction, keep) — the composed lang-id-agreement + min-length
    + repetition gate, shared by the rollup entry and the end-to-end
    assembly composition."""
    scored = X.language_id(docs).select(
        "doc_id", "lang", "source", "pred_lang",
        F.size(X.tokens("text")).cast("long").alias("n_tokens"),
    )
    # only the top-token share is gated on — skip repetition_stats' bigram
    # pass and aggregate the token counts directly
    rep = (
        docs.select("doc_id", F.explode(X.tokens("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            (F.max("c").cast("double") / F.sum("c")).alias("top_token_fraction")
        )
    )
    keep = (
        (F.col("n_tokens") >= 30)
        & (F.col("top_token_fraction") <= 0.12)
        & (F.col("lang") == F.col("pred_lang"))
    )
    return scored.join(rep, "doc_id").withColumn("keep", keep)


@register(
    "corpus_quality_gate",
    f"""
    WITH l AS ({_L}),
    scored AS (
      SELECT doc_id, lang, source,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             {_HITS_T['en']} AS e, {_HITS_T['es']} AS s,
             {_HITS_T['fr']} AS f, {_HITS_T['de']} AS d
      FROM l
    ),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM l),
    tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
    rep AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_frac
            FROM tc GROUP BY 1),
    gated AS (
      SELECT scored.lang, scored.source, scored.n_tokens,
             (scored.n_tokens >= 30
              AND rep.top_frac <= 0.12
              AND scored.lang = (
                CASE WHEN e >= s AND e >= f AND e >= d AND e > 0 THEN 'en'
                     WHEN s >= f AND s >= d AND s > 0 THEN 'es'
                     WHEN f >= d AND f > 0 THEN 'fr'
                     WHEN d > 0 THEN 'de'
                     ELSE 'und' END)) AS keep
      FROM scored JOIN rep USING (doc_id)
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
             AS kept_tokens,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
             AS kept_fraction
    FROM gated
    GROUP BY 1, 2
    """,
    survey="§7 Phase 5: the composed keep/drop corpus gate — lang-id agreement + min length + repetition threshold in one pass, rolled up per (lang, source); the filter a training pipeline actually ships",
    tags=("ext", "text"),
)
def corpus_quality_gate(spark, sf_dir):
    docs = spread(t(spark, sf_dir, "documents"))
    gated = _gated_docs(docs)
    return gated.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("keep"), F.col("n_tokens")).otherwise(0))
        .cast("long")
        .alias("kept_tokens"),
        (
            F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("kept_fraction"),
    )


@register(
    "label_embedding_centroids",
    """
    WITH x AS (
      SELECT label,
             unnest(list_transform(CAST(embedding AS DOUBLE[]),
                    (v, i) -> {'pos': i - 1, 'v': v}), recursive := true)
      FROM embeddings
    )
    SELECT label, pos,
           CAST(SUM(CAST(v AS DECIMAL(18,9))) AS DOUBLE) / count(*) AS centroid,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM x
    GROUP BY 1, 2
    """,
    survey="§7 Phase 5: per-group vector centroids (posexplode + map-side-combined decimal agg — the IVF coarse-quantizer / class-prototype training primitive; no executor holds a whole group)",
    tags=("ext", "similarity"),
)
def label_embedding_centroids(spark, sf_dir):
    from .operators.similarity import group_centroids

    return group_centroids(spread(t(spark, sf_dir, "embeddings")), "label")


# Per-source target sampling rates for the mixture: derived from the
# numeric source suffix so the weights are a pure function of the row
# (srcN keeps (1 + N mod 5)/5 of its docs — five distinct rates, all
# strata non-degenerate on the driver testdata).
_RATE = "(1 + CAST(substr(source, 4) AS BIGINT) % 5) / 5.0"


@register(
    "source_mixture_sample",
    f"""
    WITH b AS (
      SELECT source,
             {_RATE} AS rate,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                  AS BIGINT) AS bucket,
             len({_TOKS}) AS n_tokens
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS total_docs,
           CAST(count(*) FILTER (WHERE bucket < rate * 65536) AS BIGINT)
             AS sampled_docs,
           CAST(sum(n_tokens) FILTER (WHERE bucket < rate * 65536) AS BIGINT)
             AS sampled_tokens
    FROM b
    GROUP BY 1
    """,
    survey="§7 Phase 5: deterministic source-mixture sampling — per-source target rates applied via the stable md5 bucket (the data-mixing step of training-corpus assembly; reproducible across runs, partitionings, and engines — never rand())",
    tags=("ext", "text"),
)
def source_mixture_sample(spark, sf_dir):
    docs = spread(t(spark, sf_dir, "documents"))
    rate = (
        1 + F.substring("source", 4, 10).cast("long") % 5
    ).cast("double") / 5.0
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    keep = bucket < rate * 65536
    return (
        docs.select(
            "source",
            keep.alias("keep"),
            F.size(X.tokens("text")).alias("n_tokens"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total_docs"),
            F.count(F.when(F.col("keep"), 1)).cast("long").alias("sampled_docs"),
            F.sum(F.when(F.col("keep"), F.col("n_tokens")))
            .cast("long")
            .alias("sampled_tokens"),
        )
    )


@register(
    "incremental_dedup_new_docs",
    f"""
    WITH fp AS (
      SELECT doc_id, source, md5({_NORM}) AS fp FROM documents
    ),
    idx AS (SELECT DISTINCT fp FROM fp
            WHERE CAST(substr(source, 4) AS BIGINT) < 10),
    new AS (SELECT doc_id, fp FROM fp
            WHERE CAST(substr(source, 4) AS BIGINT) >= 10),
    keeper AS (SELECT fp, min(doc_id) AS doc_id FROM new GROUP BY 1)
    SELECT k.doc_id, k.fp
    FROM keeper k
    WHERE NOT EXISTS (SELECT 1 FROM idx WHERE idx.fp = k.fp)
    """,
    survey="§7 Phase 5 / §2.2 K5 shape: incremental corpus dedup — admit new-batch docs absent from the historical fingerprint index (anti-join) and first within the batch; the continuously-growing-corpus pattern (index maintained across runs, history never re-scanned)",
    tags=("ext", "dedup"),
)
def incremental_dedup_new_docs(spark, sf_dir):
    from .operators.text import fingerprint

    docs = spread(t(spark, sf_dir, "documents"))
    src_n = F.substring("source", 4, 10).cast("long")
    index_fps = docs.filter(src_n < 10).select(fingerprint("text").alias("fp"))
    new_docs = docs.filter(src_n >= 10)
    return D.incremental_exact_dedup(new_docs, index_fps)


# ---------------------------------------------------------------------------
# The capstone composition: the full corpus-assembly pipeline a training
# run actually ships — quality gate → near-dup removal → per-source quota
# → deterministic split — as ONE lazy DataFrame with ONE cross-engine
# oracle over the whole chain.
# ---------------------------------------------------------------------------


def _assembly_oracle() -> str:
    from .queries_ext import _JACCARD_ORACLE

    gate_case = """
                CASE WHEN e >= s AND e >= f AND e >= d AND e > 0 THEN 'en'
                     WHEN s >= f AND s >= d AND s > 0 THEN 'es'
                     WHEN f >= d AND f > 0 THEN 'fr'
                     WHEN d > 0 THEN 'de'
                     ELSE 'und' END"""
    norm = "trim(regexp_replace(text, '\\s+', ' ', 'g'))"
    return f"""
    WITH RECURSIVE
    l AS ({_L}),
    scored AS (
      SELECT doc_id, lang, source,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             {_HITS_T['en']} AS e, {_HITS_T['es']} AS s,
             {_HITS_T['fr']} AS f, {_HITS_T['de']} AS d
      FROM l
    ),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM l),
    tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
    rep AS (SELECT doc_id, CAST(max(c) AS DOUBLE) / sum(c) AS top_frac
            FROM tc GROUP BY 1),
    gated AS (
      SELECT scored.doc_id FROM scored JOIN rep USING (doc_id)
      WHERE scored.n_tokens >= 30
        AND rep.top_frac <= 0.12
        AND scored.lang = ({gate_case})
    ),
    pairs AS ({_JACCARD_ORACLE.format(thr=0.5)}),
    gp AS (
      SELECT doc_a, doc_b FROM pairs
      WHERE doc_a IN (SELECT doc_id FROM gated)
        AND doc_b IN (SELECT doc_id FROM gated)
    ),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM gp
              UNION
              SELECT doc_b, doc_a FROM gp),
    reach(a, b) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    cc AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
           FROM reach GROUP BY a),
    surv AS (
      SELECT doc_id FROM gated
      WHERE doc_id NOT IN (SELECT doc_id FROM cc WHERE doc_id <> cluster_id)
    ),
    feat AS (
      SELECT d.doc_id, d.source,
             CAST(len({_TOKS}) AS DOUBLE) AS n_toks,
             CAST(length({norm}) AS DOUBLE) AS n_chars,
             CAST(length({norm})
               - length(regexp_replace({norm},
                        '[.,!?;:''"()\\-]', '', 'g')) AS DOUBLE) AS punct,
             CAST(length({norm})
               - length(regexp_replace({norm},
                        '[0-9]', '', 'g')) AS DOUBLE) AS digits
      FROM documents d JOIN surv USING (doc_id)
    ),
    qual AS (
      SELECT doc_id, source,
             round(least(n_toks / 20.0, 1.0)
                   * (1 - punct / n_chars) * (1 - digits / n_chars), 4)
               AS quality
      FROM feat
    ),
    ranked AS (
      SELECT doc_id, source, quality,
             row_number() OVER (PARTITION BY source
                                ORDER BY quality DESC, doc_id) AS rk
      FROM qual
    ),
    gedges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
               UNION
               SELECT doc_b, doc_a FROM pairs),
    greach(a, b) AS (
      SELECT src, dst FROM gedges
      UNION
      SELECT g.a, e.dst FROM greach g JOIN gedges e ON g.b = e.src
    ),
    gcc AS (SELECT a AS doc_id, least(a, min(b)) AS cluster_id
            FROM greach GROUP BY a)
    SELECT doc_id, source,
           CASE WHEN bucket < 52429 THEN 'train'
                WHEN bucket < 58982 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT r.doc_id, r.source,
                 CAST(('0x' || substr(md5(CAST(
                        coalesce(g.cluster_id, r.doc_id) AS VARCHAR)), 1, 4))
                      AS BIGINT) AS bucket
          FROM ranked r LEFT JOIN gcc g ON g.doc_id = r.doc_id
          WHERE r.rk <= 10)
    """


@register(
    "corpus_assembly_end_to_end",
    _assembly_oracle(),
    survey="§7 Phase 5 capstone: the WHOLE corpus-assembly pipeline as one"
    " lazy plan — quality gate (lang-id agreement + min length +"
    " repetition) → near-dup removal (shared minhash pair stage filtered"
    " to gated endpoints, CC keep-one-per-cluster) → per-source quality"
    " quota (10) → LEAKAGE-SAFE md5 split keyed on the GLOBAL near-dup"
    " cluster representative (verdict r08 item 5: doc-keyed hashing can"
    " split two survivors bridged through an ungated near-partner across"
    " the train/test boundary; the rep-keyed rule cannot). One oracle"
    " checks the composed chain end to end, so a semantics drift in ANY"
    " stage breaks the hash",
    tags=("ext", "text", "dedup", "assembly"),
)
def corpus_assembly_end_to_end(spark, sf_dir):
    """Stage composition notes (scale): the gate is scan-side + one
    token aggregation; pairs come from the shared minhash stage (mined
    once per session, exactly how a production pipeline fans one
    pair-mining pass out to consumers) and restricting them to gated
    endpoints AFTER mining is sound because Jaccard(a, b) does not
    depend on the rest of the corpus — pairs-among-gated == gated-join
    of global pairs; CC keep-list, quota window (WindowGroupLimit), and
    the rep-keyed split are each one linear shuffle or scan-side.

    The final split is :func:`operators.graph.leakage_safe_split` over
    the GLOBAL pair relation (r08 item 5): the dedup stage's gated CC
    cannot serve it, because two gated survivors bridged through an
    UNGATED near-partner share no gated edge yet are transitive
    near-dups — only the global graph's component representative hashes
    them into the same split. The two CC runs operate on different edge
    sets by necessity (subgraph components are not derivable from graph
    components); the global run is one more linear-rounds kernel over
    the already-mined pairs."""
    from .operators.graph import (
        connected_components,
        dedup_keep_filter,
        leakage_safe_split,
    )
    from .queries_ext import _minhash_pair_stage

    docs = spread(t(spark, sf_dir, "documents"))
    gated_ids = _gated_docs(docs).filter("keep").select("doc_id")
    gated = docs.join(gated_ids, "doc_id")
    pairs = _minhash_pair_stage(spark, sf_dir)
    gp = (
        pairs.join(
            gated_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a"
        ).join(gated_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b")
    )
    cc = connected_components(gp, "doc_a", "doc_b")
    surviving = dedup_keep_filter(gated, cc)
    capped = X.per_source_quota(surviving, quota=10)
    split = leakage_safe_split(capped.select("doc_id"), pairs).select(
        "doc_id", "split"
    )
    return capped.select("doc_id", "source").join(split, "doc_id")
