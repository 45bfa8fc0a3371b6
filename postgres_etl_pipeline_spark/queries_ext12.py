"""Extension catalog, batch 12 (round 13): the TRAINED quality
classifier — the supervised corpus-filtering stage (GPT-3 / LLaMA /
RefinedWeb gate web text with a lightweight learned classifier; CCNet
pairs it with the LM-perplexity signal already shipped as
``doc_unigram_logprob``). The §7 Phase 5 filtering stack is complete
with it: heuristics (``doc_quality_scores``) → LM signal → LEARNED gate.

Both entries run the WHOLE train-then-score composition inside the
query: multinomial Naive Bayes over md5-feature-hashed tokens, trained
on the deterministic 50% md5 doc-id split with ``lang='en'`` as the
positive class (the CCNet-style target-language proxy), scored over
every document. The driver's synthetic corpus draws every language from
one shared word distribution, so the hash pins the train+score
MECHANICS exactly while the scores honestly sit near the prior; the
learning contract is pinned separately on planted class-conditional
vocabulary (tests/test_classify.py). Every step is a
relational aggregate with exact decimal score sums (per-bucket LLRs
rounded to DECIMAL(18,6) BEFORE summation — the ``tfidf_cosine_topk``
canon), so the oracle restates training AND inference as one SQL query
and the hash pins both. See ``operators/classify.py`` for the scale
shape (training shuffles ≤ 2·n_buckets partial rows; the model
broadcasts; scoring shuffles the corpus once, on ``doc_id``).

Same registry/oracle conventions as queries_ext.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import classify as C
from .queries import register, spread, t

_B = C.DEFAULT_N_BUCKETS  # 4096

# Training + inference restated relationally, shared by both oracles.
# Mirrors classify.py exactly: md5 bucket hash, Laplace alpha=1, LLR
# rounded to DECIMAL(18,6) pre-sum, unseen-bucket llr0 baseline, md5
# 50% train split, positive class lang='en'.
_NB_CORE = f"""
    toks AS (
      SELECT doc_id,
             unnest(string_split(trim(regexp_replace(text, '\\s+', ' ', 'g')),
                                 ' ')) AS tok
      FROM documents
    ),
    tb AS (
      SELECT doc_id,
             (('0x' || substr(md5(tok), 1, 8))::BIGINT % {_B}) AS bucket
      FROM toks
    ),
    bow AS (SELECT doc_id, bucket, count(*) AS tf FROM tb GROUP BY 1, 2),
    split AS (
      SELECT doc_id, lang,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
              % 100) < 50 AS is_train
      FROM documents
    ),
    tr AS (SELECT doc_id, (lang = 'en') AS y FROM split WHERE is_train),
    cnt AS (
      SELECT b.bucket,
             sum(CASE WHEN tr.y THEN b.tf ELSE 0 END) AS n_pos,
             sum(CASE WHEN tr.y THEN 0 ELSE b.tf END) AS n_neg
      FROM bow b JOIN tr USING (doc_id)
      GROUP BY 1
    ),
    tot AS (SELECT sum(n_pos) AS tot_pos, sum(n_neg) AS tot_neg FROM cnt),
    model AS (
      SELECT bucket,
             CAST(round(ln((n_pos + 1.0) / (tot_pos + {_B}.0))
                        - ln((n_neg + 1.0) / (tot_neg + {_B}.0)), 6)
                  AS DECIMAL(18,6)) AS llr
      FROM cnt, tot
    ),
    pr AS (
      SELECT CAST(round(ln(CAST(d.dp AS DOUBLE) / d.dn), 6)
                  AS DECIMAL(18,6)) AS prior,
             CAST(round(ln(1.0 / (tot_pos + {_B}.0))
                        - ln(1.0 / (tot_neg + {_B}.0)), 6)
                  AS DECIMAL(18,6)) AS llr0
      FROM (SELECT sum(CASE WHEN y THEN 1 ELSE 0 END) AS dp,
                   sum(CASE WHEN y THEN 0 ELSE 1 END) AS dn
            FROM tr) d, tot
    ),
    sc AS (
      SELECT b.doc_id, sum(b.tf * coalesce(m.llr, pr.llr0)) AS s
      FROM bow b LEFT JOIN model m USING (bucket), pr
      GROUP BY 1
    ),
    scored AS (
      SELECT sp.doc_id, sp.lang, sp.is_train,
             CAST(coalesce(sc.s, 0) + pr.prior AS DECIMAL(25,6)) AS log_odds
      FROM split sp LEFT JOIN sc USING (doc_id), pr
    )
"""


def _label_en():
    return F.col("lang") == "en"


def _classifier_frame(spark, sf_dir):
    # lang rides through the scoring shuffle via carry_cols (round 13):
    # the previous ``docs.join(scores, "doc_id")`` re-shuffled the corpus
    # a second time just to re-attach the language column.
    docs = spread(t(spark, sf_dir, "documents"))
    return C.quality_classifier_scores(
        docs, _label_en(), carry_cols=["lang"]
    )


@register(
    "nb_quality_classifier_topk",
    f"""
    WITH {_NB_CORE}
    SELECT doc_id, lang, is_train,
           CAST(log_odds AS DOUBLE) AS log_odds
    FROM scored
    ORDER BY scored.log_odds DESC, doc_id
    LIMIT 100
    """,
    survey="§7 Phase 5 extension (round 13): the LEARNED quality gate — "
    "multinomial Naive Bayes over md5-feature-hashed tokens, trained "
    "IN-ENGINE on the deterministic 50% md5 split (positive class "
    "lang='en', the CCNet-style target proxy) and scoring every doc; "
    "top-100 by log-odds. Training is one map-side-combinable "
    "(bucket,class) aggregate (≤2·4096 partial rows per task), the "
    "model is an explicit broadcast, scoring shuffles the corpus once "
    "on doc_id; LLRs are DECIMAL(18,6) pre-sum so the score is an "
    "exact decimal — the oracle restates train+inference as one query",
    tags=("ext", "text", "classify"),
)
def nb_quality_classifier_topk(spark, sf_dir):
    """Train-then-score inside the entry; top-100 most-confidently-
    positive docs. A user gates the corpus with ``log_odds > τ`` — the
    top-k form keeps the entry's output bounded at any SF."""
    return (
        _classifier_frame(spark, sf_dir)
        .orderBy(F.col("log_odds").desc(), "doc_id")
        .limit(100)
        # boundary cast only: scores stay exact decimals internally; the
        # double is the same IEEE value in both engines, while decimal
        # RENDERING (trailing zeros) is engine-specific
        .withColumn("log_odds", F.col("log_odds").cast("double"))
    )


@register(
    "nb_classifier_holdout_eval",
    f"""
    WITH {_NB_CORE}
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN log_odds > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pred_pos,
           round(CAST(sum(log_odds) AS DOUBLE) / count(*), 4)
             AS mean_log_odds
    FROM scored
    WHERE NOT is_train
    GROUP BY lang
    """,
    survey="§7 Phase 5 extension (round 13): HELD-OUT evaluation of the "
    "learned gate — per-language doc counts, predicted-positive counts "
    "and mean log-odds on the 50% the model never saw: the evaluation "
    "artifact every production gate ships with. On the driver's "
    "synthetic corpus all languages draw from ONE shared word "
    "distribution, so the honest report is near-prior scores for every "
    "class (the learning contract itself is pinned on planted "
    "class-conditional vocabulary in tests/test_classify.py). The mean "
    "divides the EXACT decimal score sum cast to double once — no "
    "order-dependent float accumulation anywhere",
    tags=("ext", "text", "classify"),
)
def nb_classifier_holdout_eval(spark, sf_dir):
    """Per-language confusion summary on held-out docs — the evidence
    the classifier LEARNED (en mean log-odds ≫ 0 ≫ others), aggregated
    to ≤ n_langs rows."""
    frame = _classifier_frame(spark, sf_dir)
    return (
        frame.where(~F.col("is_train"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("log_odds") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_pred_pos"),
            F.round(
                F.sum("log_odds").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_log_odds"),
        )
    )


@register(
    "classifier_gate_keep_rate",
    f"""
    WITH {_NB_CORE},
    ranked AS (
      SELECT doc_id, lang, CAST(log_odds AS DOUBLE) AS lo,
             row_number() OVER (
               ORDER BY CAST(-log_odds AS DOUBLE), doc_id) AS rk,
             count(*) OVER () AS n
      FROM scored
    )
    SELECT doc_id, lang, lo AS log_odds
    FROM ranked
    WHERE rk <= CAST(ceil(0.3 * n) AS BIGINT)
    """,
    survey="§7 Phase 5 extension (round 13): keep-RATE admission — keep "
    "the best 30% of the corpus by classifier score, selected by EXACT "
    "global rank under the total order (-score, doc_id). The oracle "
    "states the naive single global window; the engine runs "
    "operators.ranking.global_rank — bucketed two-pass ranking with NO "
    "single-partition exchange (the packing pattern applied to "
    "selection); ceil(0.3*N) computed in IEEE double on both sides",
    tags=("ext", "text", "classify"),
)
def classifier_gate_keep_rate(spark, sf_dir):
    """Admit the top 30% by trained-gate score via the distributed
    global ranker; returns the admitted rows themselves (the set is the
    contract — hash-order-insensitive)."""
    frame = _classifier_frame(spark, sf_dir)
    kept = C.admit_top_fraction(frame, 0.3)
    return kept.select(
        "doc_id", "lang", F.col("log_odds").cast("double").alias("log_odds")
    )


@register(
    "pareto_lottery_gate",
    f"""
    WITH {_NB_CORE},
    gate AS (
      SELECT doc_id, lang,
             1.0 / (1.0 + exp(-CAST(log_odds AS DOUBLE))) AS p,
             pow((('0x' || substr(md5('pareto:' || CAST(doc_id AS VARCHAR)),
                                  1, 8))::BIGINT + 1) / 4294967296.0,
                 -1.0 / 9.0) - 1.0 AS draw
      FROM scored
    )
    SELECT doc_id, lang, round(p, 4) AS p
    FROM gate
    WHERE draw > 1.0 - p
    """,
    survey="§7 Phase 5 extension (round 13): the GPT-3 admission "
    "LOTTERY (Brown et al. 2020 App. A) made deterministic — keep a doc "
    "when a Pareto(9) draw exceeds 1 - sigmoid(score), so high-scoring "
    "docs are near-surely kept while low-scoring ones survive with "
    "small probability (tail diversity instead of a hard cutoff); the "
    "draw derives from md5(doc_id) via exact dyadic uniform + inverse "
    "CDF, so admission is a pure function of the row on both engines — "
    "pure scan-side expressions, no shuffle beyond the scoring itself",
    tags=("ext", "text", "classify"),
)
def pareto_lottery_gate(spark, sf_dir):
    """Admission-lottery over the trained gate's scores; returns the
    admitted docs with their (display-rounded) keep probability."""
    frame = _classifier_frame(spark, sf_dir)
    return C.pareto_lottery_admit(frame).select("doc_id", "lang", "p")


@register(
    "pack_curriculum_gated_corpus",
    f"""
    WITH {_NB_CORE},
    ranked AS (
      SELECT doc_id, CAST(log_odds AS DOUBLE) AS lo,
             row_number() OVER (
               ORDER BY CAST(-log_odds AS DOUBLE), doc_id) AS rk,
             count(*) OVER () AS n
      FROM scored
    ),
    admitted AS (
      SELECT doc_id, lo FROM ranked
      WHERE rk <= CAST(ceil(0.3 * n) AS BIGINT)
    ),
    d AS (
      SELECT a.doc_id, -a.lo AS neg,
             len(string_split(trim(regexp_replace(d2.text, '\\s+', ' ', 'g')),
                              ' ')) AS n_tok
      FROM admitted a JOIN documents d2 USING (doc_id)
    ),
    o AS (
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
             CAST(SUM(n_tok) OVER (ORDER BY neg, doc_id
                    ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS start_off
      FROM d WHERE n_tok > 0
    ),
    s AS (
      SELECT o.*, k.seq_id
      FROM o, LATERAL (
        SELECT unnest(generate_series(start_off // 512,
                                      (start_off + n_tok - 1) // 512))
               AS seq_id
      ) k
    )
    SELECT CAST(seq_id AS BIGINT) AS seq_id, doc_id,
           CAST(GREATEST(start_off, seq_id * 512) - start_off AS BIGINT)
             AS doc_start_tok,
           CAST(GREATEST(start_off, seq_id * 512) - seq_id * 512 AS BIGINT)
             AS seq_off,
           CAST(LEAST(start_off + n_tok, (seq_id + 1) * 512)
                - GREATEST(start_off, seq_id * 512) AS BIGINT) AS n_tok
    FROM s
    """,
    survey="§7 Phase 5 capstone (round 13): the gated-corpus CURRICULUM "
    "pipeline in one query — train the NB gate, admit the best 30% by "
    "exact global rank, then pack the admitted corpus into 512-token "
    "sequences in DESCENDING classifier-score order (curriculum: "
    "highest-quality text trains first). Engine-side every stage is the "
    "distributed form (bucketed global_rank, two-phase prefix-sum "
    "packing keyed on (-score, doc_id) — SinglePartition absent, "
    "pinned); the oracle states the whole composition naively as one "
    "global window chain and the hash pins them equal",
    tags=("ext", "text", "classify"),
)
def pack_curriculum_gated_corpus(spark, sf_dir):
    """Learned gate -> keep-rate admission -> curriculum packing, one
    span map out; the training-data endgame composed from this round's
    operators."""
    from .operators.text import pack_sequences

    docs = spread(t(spark, sf_dir, "documents"))
    frame = _classifier_frame(spark, sf_dir)
    admitted = C.admit_top_fraction(frame, 0.3).select(
        "doc_id", (-F.col("log_odds").cast("double")).alias("neg")
    )
    gated = docs.join(admitted, "doc_id")
    return pack_sequences(gated, seq_len=512, order_col="neg")
