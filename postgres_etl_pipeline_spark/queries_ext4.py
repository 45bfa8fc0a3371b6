"""Extension catalog, batch 4 (round 6): the ETL/scale kernels that round
out the reference surface — CDC changelog application (the delete-capable
half of K5 upsert, ``grocery_lib/pg.py:33-60``), explicit skew-salted
aggregation parity, overlapping-interval union (user active-time), scalar-
quantized (int8) ANN with exact re-rank, and deterministic weighted
sampling for corpus mixing (Efraimidis–Spirakis with hash uniforms).

Same registry/oracle conventions as queries_ext.py: exact-integer or
exact-decimal parts wherever an aggregate crosses engines, one final
double division/round, BIGINT casts on DuckDB counts, total window
orderings, no raw DATE/TIMESTAMP outputs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .operators import cdc as C
from .operators import relational as R
from .operators import similarity as S
from .queries import read_events, register, spread, t

# ---------------------------------------------------------------------------
# CDC changelog apply — the delete-capable K5 (orders as the base table)
# ---------------------------------------------------------------------------

# Deterministic synthetic changelog derived from orders (no new fixtures):
# every order is inserted (seq 1); every 3rd key is re-priced by an update
# (seq 2, +100.00 — one exact IEEE add, engine-portable); every 7th key is
# deleted (seq 3). Keys divisible by 21 exercise update-then-delete; the
# final state must contain no deleted key and exactly the updated price for
# surviving updated keys.
#
# The derivation exists ONCE on each side: _CDC_LATEST_SQL is the shared
# oracle CTE chain (batch + streaming entries select different audits over
# it), and build_orders_changelog is the shared Spark-side builder (batch
# passes a batch scan thunk, the streaming twin passes a readStream thunk).
_CDC_LOG_SQL = """
    log AS (
      SELECT o_orderkey AS okey, 1 AS seq, 'I' AS op,
             o_totalprice AS totalprice, o_orderstatus AS status
      FROM orders
      UNION ALL
      SELECT o_orderkey, 2, 'U', o_totalprice + 100.0, o_orderstatus
      FROM orders WHERE o_orderkey % 3 = 0
      UNION ALL
      SELECT o_orderkey, 3, 'D', NULL, NULL
      FROM orders WHERE o_orderkey % 7 = 0
    )
    """

_CDC_LATEST_SQL = f"""
    {_CDC_LOG_SQL},
    latest AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY okey ORDER BY seq DESC) AS rn
        FROM log
      ) WHERE rn = 1 AND op <> 'D'
    )
    """

_CDC_ORACLE = f"""
    WITH {_CDC_LATEST_SQL}
    SELECT status, op AS last_op,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM latest
    GROUP BY 1, 2
    """


def build_orders_changelog(scan):
    """The shared I/U/D changelog derivation over orders.

    ``scan`` is a zero-arg thunk returning a fresh DataFrame over the
    orders relation — batch (``t(spark, sf_dir, "orders")``) or streaming
    (``sources.stream_parquet(...)``); it is invoked once per op branch
    because streaming scans cannot be shared across branches of a union.
    Any change to the derivation (op mix, update delta, sequence order)
    lands in BOTH catalog entries and the oracle CTE above or nowhere.
    """
    ins = scan().select(
        F.col("o_orderkey").alias("okey"),
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_orderstatus").alias("status"),
    )
    upd = (
        scan()
        .filter(F.col("o_orderkey") % 3 == 0)
        .select(
            F.col("o_orderkey").alias("okey"),
            F.lit(2).alias("seq"),
            F.lit("U").alias("op"),
            (F.col("o_totalprice") + F.lit(100.0)).alias("totalprice"),
            F.col("o_orderstatus").alias("status"),
        )
    )
    dels = (
        scan()
        .filter(F.col("o_orderkey") % 7 == 0)
        .select(
            F.col("o_orderkey").alias("okey"),
            F.lit(3).alias("seq"),
            F.lit("D").alias("op"),
            F.lit(None).cast("double").alias("totalprice"),
            F.lit(None).cast("string").alias("status"),
        )
    )
    return ins.unionByName(upd).unionByName(dels)


@register(
    "cdc_apply_orders",
    _CDC_ORACLE,
    survey="§2.2 K5 extension (pg.py:33-60): WAL-style I/U/D changelog "
    "collapsed to final state in ONE key-partitioned window — the "
    "delete-capable upsert plain ON CONFLICT cannot express",
    tags=("ext", "cdc"),
)
def cdc_apply_orders(spark, sf_dir):
    """Apply a deterministic insert/update/delete changelog over orders and
    audit the surviving state (count + exact-decimal price mass by status
    and last op).

    Plan shape: three scans of one cached-sized source union to the log
    (at 100 TB the log arrives as a stream/table, not a derivation); then
    ONE shuffle keyed by ``okey`` drives the row_number collapse. The
    status aggregate on the survivors is a second, output-sized shuffle.
    """
    log = build_orders_changelog(lambda: t(spark, sf_dir, "orders"))
    final = C.apply_changelog(log, keys=["okey"], order_by=[F.col("seq")])
    return final.groupBy("status", F.col("op").alias("last_op")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        R.dsum("totalprice", "total"),
    )


# ---------------------------------------------------------------------------
# Skew-salted aggregation — 5 event types over 100k+ rows = hot keys
# ---------------------------------------------------------------------------


@register(
    "salted_event_type_agg",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY 1
    """,
    survey="§2.5/§2.9 scale: two-phase SALTED aggregation over hot group "
    "keys (5 event types ← the whole stream) == plain GROUP BY; the "
    "explicit fix for agg skew AQE only covers on joins",
    tags=("ext", "scale"),
)
def salted_event_type_agg(spark, sf_dir):
    """Hot-key aggregate via ``operators.relational.salted_agg``: phase 1
    shuffles on (event_type, salt) so no reducer owns a whole event type;
    phase 2 merges ≤ ``salt_buckets`` partials per key.

    The decomposable pieces (count / decimal-sum / min / max) are exactly
    the ones salting preserves; the decimal accumulator keeps the sum
    order-independent so the salted result is bit-equal to the plain
    group-by on ANY engine — which is precisely what the oracle checks.
    """
    ev = read_events(spark, sf_dir).select(
        "event_type",
        F.col("value"),
        F.col("value").cast("decimal(18,6)").alias("dval"),
    )
    out = R.salted_agg(
        ev,
        keys=["event_type"],
        aggs={
            "n_events": ("count", "event_type"),
            "dtotal": ("sum", "dval"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
    )
    return out.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("dtotal").cast("double").alias("total_value"),
        "min_value",
        "max_value",
    )


# ---------------------------------------------------------------------------
# Overlapping-interval union — user active time from 5-minute activity spans
# ---------------------------------------------------------------------------


@register(
    "interval_union_coverage",
    """
    WITH iv AS (
      SELECT DISTINCT user_id,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS start_s,
             CAST(epoch(date_trunc('second', ts)) AS BIGINT) + 300 AS end_s
      FROM events
    ),
    flagged AS (
      SELECT user_id, start_s, end_s,
             CASE WHEN max(end_s) OVER (
                    PARTITION BY user_id ORDER BY start_s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) IS NULL
                  OR start_s > max(end_s) OVER (
                    PARTITION BY user_id ORDER BY start_s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  )
             THEN 1 ELSE 0 END AS is_new
      FROM iv
    ),
    islands AS (
      SELECT user_id, start_s, end_s,
             SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY start_s, end_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island
      FROM flagged
    ),
    merged AS (
      SELECT user_id, island,
             min(start_s) AS s, max(end_s) AS e
      FROM islands GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(SUM(e - s) AS BIGINT) AS covered_s
    FROM merged
    GROUP BY 1
    """,
    survey="§2.5/§2.8 extension: overlapping-interval UNION (running-max "
    "island merge) — activity coverage per user, the overlap-merge twin "
    "of gap-based sessionization",
    tags=("ext", "analytics"),
)
def interval_union_coverage(spark, sf_dir):
    """Merge each user's overlapping 5-minute activity intervals and
    report interval count + exact covered seconds.

    The classic running-max island algorithm: ONE shuffle keyed by
    ``user_id`` feeds the duplicate-interval dedup, every window (the
    new-island flag, the running island id), and the island aggregate —
    per-key window state is a single max, bounded at any event volume.
    Duplicate timestamps (planted in the testdata) are collapsed BEFORE
    the windows so (user_id, start_s) is unique and every window ordering
    is total — see the inline note.
    """
    # exact-duplicate intervals collapse BEFORE the windows: two events at
    # the same (user, second) yield byte-identical intervals, and keeping
    # both would leave the window orderings non-total — the is_new flag and
    # the running island id are computed under two sorts whose tie orders
    # an engine need not align (review finding r06). After distinct(),
    # (user_id, start_s) is unique, every window order is total, and the
    # island partition is engine-independent. The union semantics are
    # unchanged — duplicate intervals never affect coverage.
    iv = (
        read_events(spark, sf_dir)
        .select(
            "user_id",
            F.unix_timestamp(F.date_trunc("second", "ts")).alias("start_s"),
            (F.unix_timestamp(F.date_trunc("second", "ts")) + 300).alias(
                "end_s"
            ),
        )
        # repartition by user_id FIRST: hash(user_id) satisfies the
        # clustered distribution of the dedup aggregate AND every window,
        # so the dedup costs no exchange of its own and the whole query
        # still runs on one shuffle
        .repartition("user_id")
        .dropDuplicates(["user_id", "start_s", "end_s"])
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("start_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("start_s", "end_s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_end = F.max("end_s").over(w_prev)
    flagged = iv.withColumn(
        "is_new",
        F.when(prev_end.isNull() | (F.col("start_s") > prev_end), 1).otherwise(0),
    )
    islands = flagged.withColumn("island", F.sum("is_new").over(w_run))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("start_s").alias("s"), F.max("end_s").alias("e")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum(F.col("e") - F.col("s")).cast("long").alias("covered_s"),
    )


# ---------------------------------------------------------------------------
# Scalar-quantized (int8) ANN — integer-dot candidates, exact re-rank
# ---------------------------------------------------------------------------

_SQ8_ORACLE = """
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ),
    dims AS (
      SELECT j, CASE WHEN max(abs(x)) > 0 THEN max(abs(x)) / 127
                     ELSE 1.0 END AS s
      -- dim index derived from the row's own vector length (advice r06:
      -- a hardcoded 65 would silently desync from a re-dimensioned
      -- fixture while sq8_scales adapts)
      FROM (SELECT unnest(e) AS x, unnest(range(1, len(e) + 1)) AS j FROM v)
      GROUP BY j
    ),
    scales AS (SELECT list(s ORDER BY j) AS sl FROM dims),
    coded AS (
      SELECT vec_id, e,
             list_transform(e, (x, j) ->
               greatest(-127.0, least(127.0, floor(x / sl[j])))) AS cd
      FROM v, scales
    ),
    cands AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.e AS qe, c.e AS ce,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.cd, c.cd) DESC, c.vec_id
             ) AS crank
      FROM coded q JOIN coded c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 20
    ),
    exact AS (
      SELECT query_id, neighbor_id,
             round(list_cosine_similarity(qe, ce), 4) AS cos_sim
      FROM cands WHERE crank <= 20
    )
    SELECT query_id, neighbor_id, cos_sim,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos_sim DESC, neighbor_id) AS rank
    FROM exact
    QUALIFY rank <= 5
    """


@register(
    "sq8_quantized_topk",
    _SQ8_ORACLE,
    survey="§7 Phase 5: scalar-quantized (int8) ANN — per-dim symmetric "
    "scales, EXACT integer-dot candidate cut (engine-portable by "
    "construction), k·4 candidates re-ranked with exact cosine; the "
    "memory-side scale lever next to LSH buckets and IVF pruning",
    tags=("ext", "similarity"),
)
def sq8_quantized_topk(spark, sf_dir):
    emb = spread(t(spark, sf_dir, "embeddings"))
    return S.sq8_topk(
        corpus=emb, queries=emb.filter(F.col("vec_id") < 20), k=5, rerank=4
    )


# ---------------------------------------------------------------------------
# Weighted corpus sampling — Efraimidis–Spirakis with deterministic uniforms
# ---------------------------------------------------------------------------

_WSAMPLE_ORACLE = """
    WITH keyed AS (
      SELECT doc_id, n_chars AS weight,
             round(
               ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) + 1) / 4294967296.0)
               * 1000000.0 / n_chars, 6) AS sample_key
      FROM documents
      WHERE n_chars > 0
    )
    SELECT doc_id, weight, sample_key,
           row_number() OVER (ORDER BY sample_key DESC, doc_id) AS rank
    FROM keyed
    QUALIFY rank <= 100
    """


@register(
    "weighted_doc_sample",
    _WSAMPLE_ORACLE,
    survey="§7 Phase 5: weighted sampling WITHOUT replacement "
    "(Efraimidis–Spirakis A-Res, key = ln(u)/w) with DETERMINISTIC "
    "md5 uniforms — quality-weighted corpus subsampling that is "
    "reproducible across runs, partitionings, and engines",
    tags=("ext", "assembly"),
)
def weighted_doc_sample(spark, sf_dir):
    """Top-100 weighted sample of documents, weight = ``n_chars``.

    A-Res reduces weighted sampling to a TOP-N over per-row keys
    ``ln(u_i)/w_i`` — and top-n is exactly what Spark distributes well:
    ``orderBy(...).limit(n)`` plans as ``TakeOrderedAndProject`` (each map
    task forwards its local top 100; no global sort, no single-partition
    exchange). The uniform is hash-derived (md5 of the stable id, first 8
    hex nibbles → (0,1]), never ``rand()`` — the sample is a pure function
    of the row, so re-runs, retries, and other engines reproduce it
    bit-for-bit. Keys are scaled ×1e6 and rounded to 6 dp so the stored
    key column is robust to last-ulp ``ln`` differences across libms;
    ordering ties broken by doc_id.

    A-Res is defined for weights > 0 only: at w = 0 the key ln(u)/w is
    -Infinity in Spark doubles but NULL/error paths diverge across engines
    (advice r06), so zero-weight rows are EXCLUDED on both sides — the
    correct sampling semantics anyway (weight 0 ≡ never sampled).
    """
    docs = t(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        + 1
    ) / F.lit(4294967296.0)
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").alias("weight"),
        F.round(F.log(u) * 1000000.0 / F.col("n_chars"), 6).alias("sample_key"),
    )
    top = keyed.orderBy(F.col("sample_key").desc(), "doc_id").limit(100)
    w = Window.orderBy(F.col("sample_key").desc(), "doc_id")
    # the rank window runs AFTER the top-100 cut — 100 rows, not a
    # data-sized single-partition exchange
    return top.withColumn("rank", F.row_number().over(w))


# ---------------------------------------------------------------------------
# Prefix-filtered exact Jaccard join (PPJoin-style) — recall 1 by theorem
# ---------------------------------------------------------------------------

from .operators import dedup as D  # noqa: E402
from .operators import text as X  # noqa: E402
from .queries_ext import _JACCARD_ORACLE, _TOKS  # noqa: E402


@register(
    "jaccard_prefix_filter_dups",
    # oracle = the exact-Jaccard pair set: prefix filtering has recall 1
    # BY THEOREM (two sets with Jaccard >= t must share a prefix element
    # under any global canonical order), and verification is exact — so
    # unlike the LSH entry (empirical recall) this equality is guaranteed
    _JACCARD_ORACLE.format(thr=0.5),
    survey="§7 Phase 5: PPJoin-style prefix-filtered exact Jaccard join — "
    "candidates only from each doc's (1-t)·|S|+1 RAREST shingles "
    "(ascending-df canonical order), recall 1 by theorem, exact "
    "array-intersect verify; the deterministic candidate-reduction "
    "tier between the full inverted index and MinHash+LSH",
    tags=("ext", "dedup"),
)
def jaccard_prefix_filter_dups(spark, sf_dir):
    return D.prefix_filter_pairs(
        spread(t(spark, sf_dir, "documents")), threshold=0.5
    )


# ---------------------------------------------------------------------------
# BPE-style adjacent-pair counting — the frequency table a merge step eats
# ---------------------------------------------------------------------------


@register(
    "bpe_bigram_pair_counts",
    f"""
    WITH toks AS (SELECT {_TOKS} AS l FROM documents),
    bg AS (
      SELECT unnest(list_transform(range(2, len(l) + 1),
                    i -> l[i-1] || ' ' || l[i])) AS bigram
      FROM toks
    )
    SELECT bigram, CAST(count(*) AS BIGINT) AS n_occurrences,
           row_number() OVER (ORDER BY count(*) DESC, bigram) AS rank
    FROM bg GROUP BY 1
    QUALIFY rank <= 50
    """,
    survey="§7 Phase 5: adjacent-pair frequency table over whitespace "
    "pre-tokens — the count table each BPE merge iteration consumes "
    "(vocabulary induction); map-side-combined agg + top-50 cut",
    tags=("ext", "text"),
)
def bpe_bigram_pair_counts(spark, sf_dir):
    """Corpus-wide adjacent token-pair counts, top 50.

    The hot loop of BPE vocabulary training is "count all adjacent symbol
    pairs, merge the winner" — this is that count step, distributed: the
    pair stream is a scan-time array expression (token array bound ONCE
    via the transform(array(x)) idiom, no per-row re-tokenization), the
    aggregate is map-side combined (the shuffle carries one row per
    distinct pair per task), and the top-50 cut is TakeOrdered — each map
    task forwards 50 rows, no global sort. The rank window runs on the 50
    survivors only.
    """
    toks_bound = F.transform(
        F.array(X.tokens("text")),
        lambda tk: F.when(
            F.size(tk) >= 2,
            F.transform(
                F.sequence(F.lit(2), F.size(tk)),
                lambda i: F.concat_ws(
                    " ", F.element_at(tk, i - 1), F.element_at(tk, i)
                ),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    docs = spread(t(spark, sf_dir, "documents"))
    counted = (
        docs.select(F.explode(F.flatten(toks_bound)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    top = counted.orderBy(F.col("n_occurrences").desc(), "bigram").limit(50)
    w = Window.orderBy(F.col("n_occurrences").desc(), "bigram")
    return top.withColumn("rank", F.row_number().over(w))
