"""Unit tests for the batch-2 corpus-hygiene operators: repetition
metrics, span dedup coverage, heavy hitters (+ freqItems superset
guarantee), and numeric redaction. Crafted inputs pin the arithmetic;
the sf0.001 catalog oracles pin cross-engine parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgres_etl_pipeline_spark.operators import dedup as D
from postgres_etl_pipeline_spark.operators import text as X


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestRepetitionStats:
    def test_crafted_fractions(self, spark):
        df = _docs(spark, ["a a a a b"])
        row = X.repetition_stats(df).collect()[0]
        assert row.n_tokens == 5
        assert row.n_distinct_tokens == 2
        assert row.top_token_fraction == pytest.approx(0.8)
        # bigrams: "a a" x3, "a b" -> 4 total, 2 distinct -> dup 0.5
        assert row.dup_bigram_fraction == pytest.approx(0.5)

    def test_single_token_doc_has_null_bigram_fraction(self, spark):
        row = X.repetition_stats(_docs(spark, ["solo"])).collect()[0]
        assert row.n_tokens == 1
        assert row.dup_bigram_fraction is None

    def test_no_repetition(self, spark):
        row = X.repetition_stats(_docs(spark, ["a b c d"])).collect()[0]
        assert row.top_token_fraction == pytest.approx(0.25)
        assert row.dup_bigram_fraction == pytest.approx(0.0)


class TestSpanDupCoverage:
    def test_shared_span_flags_both_docs(self, spark):
        shared = "one two three four five six seven eight"
        df = _docs(
            spark,
            [
                shared + " tail-a",          # 2 spans, 1 duplicated
                shared + " tail-b",          # 2 spans, 1 duplicated
                "x1 x2 x3 x4 x5 x6 x7 x8",   # 1 span, unique
            ],
        )
        rows = {r.doc_id: r for r in D.span_dup_coverage(df, n=8).collect()}
        assert rows[0].n_spans == 2 and rows[0].n_dup_spans == 1
        assert rows[1].dup_span_fraction == pytest.approx(0.5)
        assert rows[2].n_dup_spans == 0

    def test_intra_doc_repeat_counts_as_dup(self, spark):
        span = "w1 w2 w3 w4 w5 w6 w7 w8"
        df = _docs(spark, [span + " " + span])
        row = D.span_dup_coverage(df, n=8).collect()[0]
        # 9 positional spans; the loop makes the first and last identical
        assert row.n_spans == 9
        assert row.n_dup_spans >= 2

    def test_short_docs_emit_no_rows(self, spark):
        assert D.span_dup_coverage(_docs(spark, ["too short"]), n=8).count() == 0


class TestHeavyHitters:
    def test_exact_topk_total_order(self, spark):
        df = _docs(spark, ["b b b a a c", "a b"])
        rows = X.heavy_hitter_tokens(df, k=2).collect()
        assert [(r.token, r.cnt) for r in rows] == [("b", 4), ("a", 3)]

    def test_freq_items_is_superset_of_exact(self, spark, sf_small):
        """DataFrame.freqItems (one-pass, no shuffle) must return a
        superset of the items whose true frequency exceeds the support —
        the guarantee that makes it the 100 TB pre-filter for the exact
        heavy-hitter aggregation."""
        docs = spark.read.parquet(f"{sf_small}/documents.parquet")
        tok = docs.select(F.explode(X.tokens("text")).alias("token"))
        support = 0.02
        approx = set(tok.stat.freqItems(["token"], support).collect()[0][0])
        total = tok.count()
        exact = {
            r.token
            for r in tok.groupBy("token").count().collect()
            if r["count"] / total > support
        }
        assert exact <= approx


class TestRedaction:
    def test_redact_numbers_column(self, spark):
        df = spark.createDataFrame(
            [("abc 123 x-4.5 end",), ("no digits",)], "s string"
        )
        out = [r[0] for r in df.select(X.redact_numbers("s")).collect()]
        assert out == ["abc <NUM> x<NUM> end", "no digits"]

    def test_redaction_stats_counts(self, spark):
        df = spark.createDataFrame(
            [("a", '{"x": 1, "y": 22}'), ("a", '{"x": 3, "y": 22}'), ("b", "{}")],
            "g string, s string",
        )
        rows = {r.g: r for r in X.redaction_stats(df, "s", "g").collect()}
        assert rows["a"].n_redacted == 4
        assert rows["a"].rows_with_pii == 2
        # both 'a' rows collapse to the same template after redaction
        assert rows["a"].n_templates == 1
        assert rows["b"].n_redacted == 0 and rows["b"].n_templates == 1


class TestCorpusGate:
    def test_gate_is_non_degenerate_on_testdata(self, spark, sf_small):
        from postgres_etl_pipeline_spark.queries import REGISTRY, queries

        queries()
        out = REGISTRY["corpus_quality_gate"].fn(spark, sf_small)
        agg = out.agg(
            F.sum("n_docs").alias("docs"), F.sum("n_kept").alias("kept")
        ).collect()[0]
        # thresholds must actually split the corpus: some kept, some dropped
        assert 0 < agg.kept < agg.docs


class TestGroupCentroids:
    def test_crafted_centroid(self, spark):
        from postgres_etl_pipeline_spark.operators.similarity import group_centroids

        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (1, [3.0, 6.0]), (2, [5.0, 5.0])],
            "label int, embedding array<float>",
        )
        rows = {(r.label, r.pos): r for r in group_centroids(df).collect()}
        assert rows[(1, 0)].centroid == pytest.approx(2.0)
        assert rows[(1, 1)].centroid == pytest.approx(4.0)
        assert rows[(2, 0)].n_vectors == 1


class TestSourceMixture:
    def test_rates_are_applied_non_degenerately(self, spark, sf_small):
        from postgres_etl_pipeline_spark.queries import REGISTRY, queries

        queries()
        out = REGISTRY["source_mixture_sample"].fn(spark, sf_small).collect()
        by_src = {r.source: r for r in out}
        # rate-1.0 sources keep everything; rate-0.2 sources keep a strict subset
        full = [r for r in out if r.sampled_docs == r.total_docs]
        partial = [r for r in out if 0 < r.sampled_docs < r.total_docs]
        assert full and partial

    def test_temperature_rates_follow_char_mass(self, spark, sf_small):
        """temperature_mixture_sample: the smallest source (by char mass)
        keeps rate 1.0; rates are non-increasing in total_chars (the
        alpha=0.5 exponential-smoothing shape); sampling never exceeds
        the stratum."""
        from postgres_etl_pipeline_spark.queries import REGISTRY, queries

        queries()
        out = REGISTRY["temperature_mixture_sample"].fn(spark, sf_small).collect()
        assert len(out) > 1
        by_chars = sorted(out, key=lambda r: r.total_chars)
        assert by_chars[0].rate_ppm == 1_000_000  # smallest kept whole
        ppms = [r.rate_ppm for r in by_chars]
        assert all(a >= b for a, b in zip(ppms, ppms[1:]))
        assert ppms[-1] < 1_000_000  # biggest source genuinely down-weighted
        for r in out:
            assert 0 <= r.sampled_docs <= r.total_docs


class TestIncrementalDedup:
    def test_index_hit_and_intra_batch_dup_are_dropped(self, spark):
        from postgres_etl_pipeline_spark.operators.dedup import (
            incremental_exact_dedup,
        )
        from postgres_etl_pipeline_spark.operators.text import fingerprint

        index_docs = _docs(spark, ["already indexed"])
        index_fps = index_docs.select(fingerprint("text").alias("fp"))
        new = spark.createDataFrame(
            [
                (10, "already indexed"),   # dup of history -> dropped
                (11, "fresh doc"),         # admitted
                (12, "fresh doc"),         # intra-batch dup -> dropped
                (13, "another one"),       # admitted
            ],
            "doc_id long, text string",
        )
        kept = {r.doc_id for r in incremental_exact_dedup(new, index_fps).collect()}
        assert kept == {11, 13}


class TestBloomIncrementalDedup:
    """bloom_incremental_exact_dedup must be OUTPUT-IDENTICAL to
    incremental_exact_dedup at any Bloom sizing — the filter only routes
    work; false positives are re-verified exactly and false negatives
    cannot exist (a member fingerprint always finds all its k bits set)."""

    def _relations(self, spark):
        from postgres_etl_pipeline_spark.operators.text import fingerprint

        index_docs = _docs(spark, ["already indexed", "old friend", "archive"])
        index_fps = index_docs.select(fingerprint("text").alias("fp"))
        new = spark.createDataFrame(
            [
                (10, "already indexed"),  # dup of history -> dropped
                (11, "fresh doc"),        # admitted
                (12, "fresh doc"),        # intra-batch dup -> dropped
                (13, "another one"),      # admitted
                (14, "old friend"),       # dup of history -> dropped
                (15, "brand new"),        # admitted
            ],
            "doc_id long, text string",
        )
        return new, index_fps

    def test_matches_plain_incremental_at_sane_sizing(self, spark):
        from postgres_etl_pipeline_spark.operators.dedup import (
            bloom_incremental_exact_dedup,
            incremental_exact_dedup,
        )

        new, index_fps = self._relations(spark)
        expected = {
            (r.doc_id, r.fp)
            for r in incremental_exact_dedup(new, index_fps).collect()
        }
        got = {
            (r.doc_id, r.fp)
            for r in bloom_incremental_exact_dedup(
                new, index_fps, num_bits=1 << 14, num_hashes=4
            ).collect()
        }
        assert got == expected
        assert {d for d, _ in got} == {11, 13, 15}

    def test_exact_under_saturated_filter(self, spark):
        """num_bits=64, k=8: the filter saturates and nearly everything is
        a probable hit — the exact verify join must still produce the
        identical admitted set (the false-positive path end-to-end)."""
        from postgres_etl_pipeline_spark.operators.dedup import (
            bloom_incremental_exact_dedup,
            incremental_exact_dedup,
        )

        new, index_fps = self._relations(spark)
        expected = {
            (r.doc_id, r.fp)
            for r in incremental_exact_dedup(new, index_fps).collect()
        }
        got = {
            (r.doc_id, r.fp)
            for r in bloom_incremental_exact_dedup(
                new, index_fps, num_bits=64, num_hashes=8
            ).collect()
        }
        assert got == expected

    def test_no_false_negatives_and_bounded_words(self, spark):
        """Every indexed fingerprint probes positive against its own
        filter (Bloom's one-sided-error guarantee, the correctness
        precondition for skipping the verify join on negatives), and the
        packed relation is bounded by the bit budget."""
        from postgres_etl_pipeline_spark.operators.dedup import (
            bloom_bit_words,
            bloom_incremental_exact_dedup,
        )
        from postgres_etl_pipeline_spark.operators.text import fingerprint

        num_bits, k = 1 << 10, 4
        texts = [f"document number {i}" for i in range(50)]
        index_docs = _docs(spark, texts)
        index_fps = index_docs.select(fingerprint("text").alias("fp"))

        words = bloom_bit_words(index_fps, num_bits, k)
        assert words.count() <= num_bits // 64

        # re-probe the index against itself: every doc is a dup -> empty
        reprobe = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        admitted = bloom_incremental_exact_dedup(
            reprobe, index_fps, num_bits=num_bits, num_hashes=k
        )
        assert admitted.count() == 0

    def test_merge_bloom_words_equals_rebuild_and_is_idempotent(self, spark):
        """Folding a batch's word relation into the persisted filter must
        equal rebuilding the filter over the union of fingerprints, and
        re-merging the same delta must change nothing (at-least-once
        safety)."""
        from postgres_etl_pipeline_spark.operators.dedup import (
            bloom_bit_words,
            merge_bloom_words,
        )
        from postgres_etl_pipeline_spark.operators.text import fingerprint

        num_bits, k = 1 << 10, 4
        a = _docs(spark, [f"hist {i}" for i in range(30)]).select(
            fingerprint("text").alias("fp")
        )
        b = _docs(spark, [f"batch {i}" for i in range(10)]).select(
            fingerprint("text").alias("fp")
        )
        merged = merge_bloom_words(
            bloom_bit_words(a, num_bits, k), bloom_bit_words(b, num_bits, k)
        )
        rebuilt = bloom_bit_words(a.unionByName(b), num_bits, k)
        as_set = lambda df: {(r.word_idx, r.bits) for r in df.collect()}
        assert as_set(merged) == as_set(rebuilt)
        twice = merge_bloom_words(merged, bloom_bit_words(b, num_bits, k))
        assert as_set(twice) == as_set(merged)

    def test_disjoint_batch_fully_admitted(self, spark):
        from postgres_etl_pipeline_spark.operators.dedup import (
            bloom_incremental_exact_dedup,
        )
        from postgres_etl_pipeline_spark.operators.text import fingerprint

        index_docs = _docs(spark, ["history a", "history b"])
        index_fps = index_docs.select(fingerprint("text").alias("fp"))
        new = spark.createDataFrame(
            [(i, f"novel {i}") for i in range(20)], "doc_id long, text string"
        )
        assert (
            bloom_incremental_exact_dedup(
                new, index_fps, num_bits=1 << 14, num_hashes=4
            ).count()
            == 20
        )


class TestStopShingleCap:
    """jaccard_pairs skew guard: shingles shared by more than
    max(stop_min_df, stop_max_df_frac * n_docs) documents are dropped
    before the inverted-index self-join (the 100x scale-killer fix —
    one boilerplate shingle over k docs otherwise emits k^2/2 candidates)."""

    BOILER = "the quick brown fox jumps over the lazy sleeping dog tonight now"

    def _corpus(self, spark, n=60):
        # every doc: 12 shared boilerplate tokens + 4 unique tokens
        return _docs(
            spark,
            [f"{self.BOILER} u{i}a u{i}b u{i}c u{i}d" for i in range(n)],
        )

    def test_hot_shingles_detected_and_bounded(self, spark):
        df = self._corpus(spark)
        sh = D.doc_shingles(df).withColumn("hs", F.xxhash64("shingle"))
        n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
        hot = D.stop_shingle_hashes(sh, n_docs, max_df_frac=0.25, min_df=8)
        # exactly the 10 all-boilerplate shingles cross cap=ceil(0.25*60)=15
        # (boundary shingles mix unique tokens, df=1)
        assert hot.count() == 10
        kept = sh.join(F.broadcast(hot), "hs", "left_anti")
        # candidate volume through the self-join is now bounded: every
        # surviving shingle has df <= cap; worst-case fan-out per key is
        # cap^2 instead of n^2
        max_df = kept.groupBy("hs").count().agg(F.max("count")).collect()[0][0]
        assert max_df <= 15

    def test_cap_drops_boilerplate_only_pairs(self, spark):
        df = self._corpus(spark)
        uncapped = D.jaccard_pairs(df, threshold=0.5, stop_max_df_frac=None)
        # shared 10 of 14 shingles -> jaccard 10/18 = 0.556: all N^2/2 pairs
        assert uncapped.count() == 60 * 59 // 2
        capped = D.jaccard_pairs(
            df, threshold=0.5, stop_max_df_frac=0.25, stop_min_df=8
        )
        # boilerplate no longer contributes intersections -> no pairs at all
        assert capped.count() == 0

    def test_absolute_cap_survives_df_dilution(self, spark):
        """SCALE.md "measured adversary" in miniature: 4 sub-corpora of 60
        docs, each with its OWN boilerplate. Per-boilerplate-shingle df
        stays 60 while the corpus grows to 240, so the df FRACTION dilutes
        to exactly the 0.25 cap — the fractional guard stops firing and
        the inverted index pays every within-group pair again. The
        absolute cap keys on posting-list LENGTH and is immune."""
        texts = []
        for r in range(4):
            boiler = " ".join(f"w{r}t{j}" for j in range(12))
            texts += [f"{boiler} u{r}x{i}a u{r}x{i}b u{r}x{i}c u{r}x{i}d"
                      for i in range(60)]
        df = _docs(spark, texts)
        diluted = D.jaccard_pairs(
            df, threshold=0.5, stop_max_df_frac=0.25, stop_min_df=8
        )
        # cap = ceil(0.25*240) = 60, filter is df > 60: boilerplate (df=60)
        # survives -> all 4 * C(60,2) boilerplate-only pairs come back
        assert diluted.count() == 4 * (60 * 59 // 2)
        absolute = D.jaccard_pairs(
            df, threshold=0.5, stop_max_df_frac=0.25, stop_min_df=8,
            stop_max_df=15,
        )
        assert absolute.count() == 0

    def test_tighter_cap_wins_and_args_validated(self, spark):
        df = self._corpus(spark)
        sh = D.doc_shingles(df).withColumn("hs", F.xxhash64("shingle"))
        n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
        both = D.stop_shingle_hashes(
            sh, n_docs, max_df_frac=0.9, min_df=8, max_df=15
        )
        alone = D.stop_shingle_hashes(
            sh, n_docs, max_df_frac=None, min_df=8, max_df=15
        )
        # frac cap would be ceil(0.9*60)=54; absolute 15 is tighter and wins
        assert both.count() == alone.count() == 10
        with pytest.raises(ValueError, match="max_df"):
            D.stop_shingle_hashes(sh, n_docs, max_df_frac=None, min_df=8)

    @pytest.mark.parametrize("tier", ["sf_small", "sf_med"])
    def test_catalog_cap_is_identity_on_testdata(self, spark, tier, request):
        """On the sf corpora no shingle crosses the catalog's opt-in cap
        (0.25/64), so the capped operator must be bit-identical to the
        exact library default (this is what keeps jaccard_near_dups
        oracle-green). The library default itself is uncapped/exact.
        Checked at BOTH tiers the driver harness runs (sf0.001 tests,
        sf0.01 correctness) per round-4 advice."""
        docs = spark.read.parquet(f"{request.getfixturevalue(tier)}/documents.parquet")
        a = sorted(map(tuple, D.jaccard_pairs(docs, 0.5).collect()))
        b = sorted(map(tuple,
                       D.jaccard_pairs(docs, 0.5, stop_max_df_frac=0.25,
                                       stop_min_df=64).collect()))
        assert a == b and len(a) > 0


class TestUnigramLogprob:
    def test_crafted_distribution(self, spark):
        import math

        df = _docs(spark, ["a a b", "c"])
        got = {r.doc_id: r for r in X.unigram_logprob_scores(df).collect()}
        # corpus: a:2, b:1, c:1, total 4
        d0 = (2 * math.log(2 / 4) + 1 * math.log(1 / 4)) / 3
        d1 = math.log(1 / 4)
        assert got[0].n_tokens == 3 and got[1].n_tokens == 1
        assert got[0].mean_logprob == pytest.approx(round(d0, 4))
        assert got[1].mean_logprob == pytest.approx(round(d1, 4))
        # corpus-typical doc scores HIGHER (closer to 0) than the one-off
        assert got[0].mean_logprob > got[1].mean_logprob


class TestPerSourceQuota:
    """Domain balancing: top-quota docs per source by composite quality,
    doc_id tie-break; small sources survive whole."""

    def test_quota_keeps_best_and_small_sources_survive(self, spark):
        clean20 = " ".join(f"tok{i}" for i in range(20))   # quality 1.0
        clean10 = " ".join(f"tok{i}" for i in range(10))   # quality 0.5
        clean5 = " ".join(f"tok{i}" for i in range(5))     # quality 0.25
        df = spark.createDataFrame(
            [
                (1, clean5, "A"),
                (2, clean20, "A"),
                (3, clean10, "A"),
                (4, clean10, "B"),
            ],
            "doc_id long, text string, source string",
        )
        out = X.per_source_quota(df, quota=2).collect()
        got = {(r.doc_id, r.source, r.src_rank) for r in out}
        assert got == {(2, "A", 1), (3, "A", 2), (4, "B", 1)}

    def test_tie_breaks_by_doc_id(self, spark):
        same = " ".join(f"x{i}" for i in range(10))
        df = spark.createDataFrame(
            [(7, same, "A"), (3, same, "A"), (5, same, "A")],
            "doc_id long, text string, source string",
        )
        out = X.per_source_quota(df, quota=2)
        assert [(r.doc_id, r.src_rank) for r in out.collect()] == [
            (3, 1),
            (5, 2),
        ]


class TestSimhashDistinctTokens:
    """Set-of-words simhash (SCALE.md measured adversary #2): a token
    dominating every doc's mass drags default bag-of-words signatures
    together; counting each distinct token once restores separation."""

    def _padded(self, spark):
        # two docs with fully disjoint real content, each padded so the
        # SAME boilerplate token is ~90% of its token mass
        pad = " ".join(["bp"] * 90)
        return _docs(
            spark,
            [
                "alpha beta gamma delta epsilon zeta eta theta " + pad,
                "one two three four five six seven eight " + pad,
            ],
        )

    def test_bag_of_words_collapses_distinct_separates(self, spark):
        df = self._padded(spark)
        default_pairs = D.simhash_near_dups(df, max_hamming=3)
        assert default_pairs.count() == 1  # signature collapse: false pair
        distinct_pairs = D.simhash_near_dups(df, max_hamming=3,
                                             distinct_tokens=True)
        assert distinct_pairs.count() == 0

    def test_distinct_keeps_true_dups(self, spark):
        # same distinct-token SET (repetition differs) -> identical
        # set-of-words signatures; a disjoint third doc stays out
        base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        df = _docs(
            spark,
            [base, base + " alpha alpha beta", "totally different words here"],
        )
        pairs = D.simhash_near_dups(df, max_hamming=3, distinct_tokens=True)
        assert [(r.doc_a, r.doc_b, r.hamming) for r in pairs.collect()] == [
            (0, 1, 0)
        ]


class TestDecontaminate:
    def test_exact_copy_and_clean_doc(self, spark):
        eval_df = _docs(spark, ["the quick brown fox jumps over the lazy dog today"])
        corpus = spark.createDataFrame(
            [
                (10, "the quick brown fox jumps over the lazy dog today"),  # copy
                (11, "a completely different sentence with other words here now"),
                (12, "prefix words then the quick brown fox jumps over the lazy dog today"),
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r.n_hits for r in D.decontaminate(corpus, eval_df, n=8).collect()}
        # 10-token eval doc has 3 distinct 8-grams; doc 10 shares all 3,
        # doc 12 contains the full eval text so shares all 3 too
        assert got == {10: 3, 12: 3}

    def test_min_hits_threshold(self, spark):
        eval_df = _docs(spark, ["a b c d e f g h i j"])
        corpus = spark.createDataFrame(
            [(10, "a b c d e f g h x y")], "doc_id long, text string"
        )  # shares exactly one 8-gram (a..h)
        assert D.decontaminate(corpus, eval_df, n=8, min_hits=2).count() == 0
        one = D.decontaminate(corpus, eval_df, n=8, min_hits=1).collect()
        assert [(r.doc_id, r.n_hits) for r in one] == [(10, 1)]


class TestChunkDocuments:
    def test_short_doc_single_chunk(self, spark):
        from postgres_etl_pipeline_spark.operators.text import chunk_documents

        df = _docs(spark, ["a b c"])
        rows = chunk_documents(df, chunk_tokens=8, overlap=2).collect()
        assert len(rows) == 1
        assert rows[0].chunk_idx == 0
        assert rows[0].chunk_n_tokens == 3
        assert rows[0].chunk_text == "a b c"

    def test_overlap_and_tail_coverage(self, spark):
        from postgres_etl_pipeline_spark.operators.text import chunk_documents

        toks = [f"t{i}" for i in range(10)]
        df = _docs(spark, [" ".join(toks)])
        rows = sorted(
            chunk_documents(df, chunk_tokens=4, overlap=2).collect(),
            key=lambda r: r.chunk_idx,
        )
        # stride 2, starts 0,2,4,6 (<= n - overlap - 1 = 7): tail covered
        texts = [r.chunk_text.split() for r in rows]
        assert [t[0] for t in texts] == ["t0", "t2", "t4", "t6"]
        # consecutive chunks share exactly `overlap` tokens
        for a, b in zip(texts, texts[1:]):
            assert a[-2:] == b[:2]
        # every token appears in some chunk
        assert set(toks) == {tok for t in texts for tok in t}

    def test_overlap_must_be_smaller_than_chunk(self, spark):
        from postgres_etl_pipeline_spark.operators.text import chunk_documents

        with pytest.raises(ValueError, match="overlap"):
            chunk_documents(_docs(spark, ["x"]), chunk_tokens=4, overlap=4)


class TestSortedNeighborhood:
    """SNM (sorted-neighborhood) near-dup mining semantics."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_adjacent_dups_found(self, spark):
        from postgres_etl_pipeline_spark.operators.dedup import (
            sorted_neighborhood_pairs,
        )

        base = "alpha beta gamma delta epsilon zeta"
        rows = [
            (0, base),
            (1, base),  # exact dup — adjacent after sort, jaccard 1.0
            (2, "zz completely different words here now ok"),
        ]
        pairs = sorted_neighborhood_pairs(self._docs(spark, rows)).collect()
        assert [(p.doc_a, p.doc_b, p.jaccard) for p in pairs] == [(0, 1, 1.0)]

    def test_window_bounds_recall(self, spark):
        from postgres_etl_pipeline_spark.operators.dedup import (
            sorted_neighborhood_pairs,
        )

        # near-dups separated by TWO interleaving sort keys: window=3
        # (offsets 1-2) misses the pair, window=4 reaches offset 3
        d = "mm nn oo pp qq rr"
        rows = [
            (0, "aa " + d),
            (1, "ab novel tokens one two three four"),
            (2, "ac other tokens five six seven eight"),
            (3, "ad " + d),  # near-dup of 0 (shares the d-shingles)
        ]
        w3 = sorted_neighborhood_pairs(self._docs(spark, rows), window=3,
                                       threshold=0.3).collect()
        w4 = sorted_neighborhood_pairs(self._docs(spark, rows), window=4,
                                       threshold=0.3).collect()
        assert (0, 3) not in {(p.doc_a, p.doc_b) for p in w3}
        assert (0, 3) in {(p.doc_a, p.doc_b) for p in w4}

    def test_no_single_partition_exchange(self, spark, sf_small):
        from postgres_etl_pipeline_spark.operators.dedup import (
            sorted_neighborhood_pairs,
        )

        df = spark.read.parquet(f"{sf_small}/documents.parquet")
        plan = (
            sorted_neighborhood_pairs(df)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange SinglePartition" not in plan

    def test_empty_input(self, spark):
        from postgres_etl_pipeline_spark.operators.dedup import (
            sorted_neighborhood_pairs,
        )

        df = self._docs(spark, []).filter("doc_id > 0")
        assert sorted_neighborhood_pairs(df).collect() == []

    def test_multipass_suffix_order_recovers_prefix_divergent_pair(
        self, spark
    ):
        """The classic SNM blind spot and its remedy (verdict r07 item 6):
        docs 0 and 3 share a long TAIL but diverge at the front, so the
        prefix order sorts them to opposite ends (filler docs in between)
        and the single pass never compares them; the reversed-key pass
        sorts them adjacent and the pair verifies. Multi-pass must also
        keep every single-pass pair (candidate superset)."""
        from pyspark.sql import functions as F

        from postgres_etl_pipeline_spark.operators.dedup import (
            multipass_snm_pairs,
            sorted_neighborhood_pairs,
        )
        from postgres_etl_pipeline_spark.operators.text import normalize_ws

        tail = "mm nn oo pp qq rr ss tt uu vv"
        rows = [
            (0, "aaa " + tail),
            (1, "ggg novel tokens one two three four five"),
            (2, "nnn other tokens six seven eight nine ten"),
            (3, "zzz " + tail),  # same tail, opposite end of prefix order
        ]
        df = self._docs(spark, rows)
        single = {
            (p.doc_a, p.doc_b)
            for p in sorted_neighborhood_pairs(
                df, window=3, threshold=0.3
            ).collect()
        }
        norm = F.lower(normalize_ws(F.col("text")))
        multi = {
            (p.doc_a, p.doc_b)
            for p in multipass_snm_pairs(
                df, [norm, F.reverse(norm)], window=3, threshold=0.3
            ).collect()
        }
        assert (0, 3) not in single
        assert (0, 3) in multi
        assert single <= multi


class TestIncrementalNearDup:
    """incremental_minhash_dedup: admission against a stored band index +
    within-batch first-wins, exact-verified; index accretion across two
    increments."""

    # >= 3 whitespace tokens per doc so 3-shingles exist; near-dups share
    # most shingles, distinct docs share none
    STORED = "alpha beta gamma delta epsilon zeta eta theta"
    NEAR_STORED = "alpha beta gamma delta epsilon zeta eta iota"   # ~0.6 jac
    FRESH = "one two three four five six seven eight"
    NEAR_FRESH = "one two three four five six seven nine"
    OTHER = "red orange yellow green blue indigo violet ultraviolet"

    def _run(self, spark, stored_rows, new_rows, threshold=0.5):
        from postgres_etl_pipeline_spark.operators.dedup import (
            incremental_minhash_dedup,
            minhash_band_rows,
        )

        stored = spark.createDataFrame(stored_rows, "doc_id long, text string")
        new = spark.createDataFrame(new_rows, "doc_id long, text string")
        idx = minhash_band_rows(stored)
        return {
            r.doc_id
            for r in incremental_minhash_dedup(
                new, idx, stored, threshold=threshold
            ).collect()
        }

    def test_stored_hit_and_intra_batch_dup_dropped(self, spark):
        kept = self._run(
            spark,
            stored_rows=[(1, self.STORED)],
            new_rows=[
                (10, self.NEAR_STORED),  # near-dup of history -> dropped
                (11, self.FRESH),        # admitted
                (12, self.NEAR_FRESH),   # dominated by 11 -> dropped
                (13, self.OTHER),        # admitted
            ],
        )
        assert kept == {11, 13}

    def test_lower_id_dominates_regardless_of_its_own_fate(self, spark):
        # 10 is itself rejected (near-dup of stored), but still dominates
        # 12 — admission must not depend on the dominator's fate
        kept = self._run(
            spark,
            stored_rows=[(1, self.STORED)],
            new_rows=[(10, self.NEAR_STORED), (12, self.NEAR_STORED)],
        )
        assert kept == set()

    def test_index_accretion_across_increments(self, spark):
        from postgres_etl_pipeline_spark.operators.dedup import (
            incremental_minhash_dedup,
            minhash_band_rows,
        )

        stored = spark.createDataFrame(
            [(1, self.STORED)], "doc_id long, text string"
        )
        idx = minhash_band_rows(stored)
        b1 = spark.createDataFrame(
            [(10, self.FRESH)], "doc_id long, text string"
        )
        adm1 = incremental_minhash_dedup(b1, idx, stored, threshold=0.5)
        assert {r.doc_id for r in adm1.collect()} == {10}

        # append the admitted increment to BOTH the index and the corpus
        stored2 = stored.unionByName(b1.join(adm1, "doc_id", "left_semi"))
        idx2 = idx.unionByName(
            minhash_band_rows(b1.join(adm1, "doc_id", "left_semi"))
        )
        # a near-dup of batch-1's admitted doc must now be rejected
        b2 = spark.createDataFrame(
            [(20, self.NEAR_FRESH), (21, self.OTHER)],
            "doc_id long, text string",
        )
        adm2 = {
            r.doc_id
            for r in incremental_minhash_dedup(
                b2, idx2, stored2, threshold=0.5
            ).collect()
        }
        assert adm2 == {21}

    def test_high_threshold_admits_mid_similarity(self, spark):
        kept = self._run(
            spark,
            stored_rows=[(1, self.STORED)],
            new_rows=[(10, self.NEAR_STORED)],
            threshold=0.9,
        )
        assert kept == {10}  # ~0.6 jaccard < 0.9 -> admitted


class TestDsirWeights:
    """Pins dsir_weights' semantics against a hashlib/math reference:
    target docs define the distribution but are never scored, weights
    are the exact decimal sum of pre-rounded per-bucket log-ratios, and
    a doc made of target-only vocabulary outscores one of raw-only
    vocabulary."""

    B = 16  # tiny bucket space so collisions actually occur in-test

    @staticmethod
    def _bucket(token: str) -> int:
        import hashlib

        return int(hashlib.md5(token.encode()).hexdigest()[:15], 16) % 16

    def _reference(self, rows):
        """rows: (doc_id, text, is_target). Returns {doc_id: weight}."""
        import math
        from collections import Counter

        ct, cr = Counter(), Counter()
        per_doc = {}
        for doc_id, text, is_target in rows:
            buckets = Counter(self._bucket(tok) for tok in text.split())
            (ct if is_target else cr).update(buckets)
            if not is_target:
                per_doc[doc_id] = buckets
        tot_t, tot_r = sum(ct.values()), sum(cr.values())
        lam = {
            b: round(
                math.log((ct[b] + 1.0) / (tot_t + self.B))
                - math.log((cr[b] + 1.0) / (tot_r + self.B)),
                4,
            )
            for b in set(ct) | set(cr)
        }
        return {
            d: round(sum(cnt * lam[b] for b, cnt in buckets.items()), 4)
            for d, buckets in per_doc.items()
        }

    def _run(self, spark, rows):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, is_target boolean"
        )
        out = X.dsir_weights(
            df, F.col("is_target"), n_buckets=self.B
        ).collect()
        return {r.doc_id: float(r.weight_dec) for r in out}

    def test_matches_reference_and_excludes_target(self, spark):
        rows = [
            (0, "alpha beta alpha", True),
            (1, "beta gamma", True),
            (2, "alpha beta beta", False),
            (3, "delta epsilon zeta", False),
            (4, "alpha alpha alpha alpha", False),
        ]
        got = self._run(spark, rows)
        want = self._reference(rows)
        assert set(got) == {2, 3, 4}  # targets 0,1 never scored
        for d in got:
            assert got[d] == pytest.approx(want[d], abs=1e-9), d

    def test_target_vocab_outscores_raw_vocab(self, spark):
        rows = [
            (0, "alpha beta gamma alpha beta", True),
            (1, "delta epsilon zeta delta", False),
            (2, "alpha beta gamma", False),  # pure target vocabulary
            (3, "delta epsilon zeta", False),  # pure raw vocabulary
        ]
        got = self._run(spark, rows)
        assert got[2] > got[3]

    def test_all_target_or_all_raw_is_safe(self, spark):
        # all-target: nothing to score -> empty
        rows = [(0, "a b", True), (1, "c d", True)]
        assert self._run(spark, rows) == {}
        # all-raw: lam = ln(1/B) - ln((c+1)/(tot+B)), still well-defined
        rows = [(0, "a b", False), (1, "a c", False)]
        got = self._run(spark, rows)
        assert set(got) == {0, 1}
        want = self._reference(rows)
        for d in got:
            assert got[d] == pytest.approx(want[d], abs=1e-9)


class TestSpanDedupRewrite:
    """Lee et al. substring-removal semantics: duplicated n-gram spans
    keep their globally-first occurrence and are cut everywhere else;
    overlapping duplicated spans merge into one removed island."""

    def test_exact_duplicate_doc_is_emptied_canonical_kept(self, spark):
        boiler = " ".join(f"w{i}" for i in range(10))
        out = {
            r.doc_id: r
            for r in D.span_dedup_rewrite(
                _docs(spark, [boiler, boiler]), n=8
            ).collect()
        }
        assert out[0].n_removed == 0 and out[0].cleaned_text == boiler
        assert out[1].n_removed == 10 and out[1].cleaned_text == ""

    def test_shared_prefix_cut_from_noncanonical_only(self, spark):
        shared = " ".join(f"s{i}" for i in range(8))  # exactly one 8-gram
        d0 = shared + " alpha beta"
        d1 = shared + " gamma delta"
        out = {
            r.doc_id: r
            for r in D.span_dedup_rewrite(_docs(spark, [d0, d1]), n=8).collect()
        }
        assert out[0].n_removed == 0 and out[0].cleaned_text == d0
        assert out[1].n_removed == 8 and out[1].cleaned_text == "gamma delta"

    def test_within_doc_repeat_keeps_first_occurrence(self, spark):
        span = " ".join(f"r{i}" for i in range(8))
        doc = span + " middle " + span
        row = D.span_dedup_rewrite(_docs(spark, [doc]), n=8).collect()[0]
        assert row.n_tokens == 17
        assert row.n_removed == 8
        assert row.cleaned_text == span + " middle"

    def test_overlapping_spans_merge_into_one_island(self, spark):
        # 9 shared tokens -> two overlapping duplicated 8-grams in the
        # non-canonical doc; the cut is their union (9 tokens), not 16.
        shared = " ".join(f"o{i}" for i in range(9))
        out = {
            r.doc_id: r
            for r in D.span_dedup_rewrite(
                _docs(spark, [shared + " x", shared + " y"]), n=8
            ).collect()
        }
        assert out[1].n_removed == 9
        assert out[1].cleaned_text == "y"

    def test_short_docs_pass_through(self, spark):
        texts = ["tiny doc", "tiny doc"]  # < n tokens: no spans at all
        for r in D.span_dedup_rewrite(_docs(spark, texts), n=8).collect():
            assert r.n_removed == 0 and r.cleaned_text == "tiny doc"

    def test_kept_text_is_subsequence_and_counts_reconcile(self, spark, sf_small):
        docs = spark.read.parquet(f"{sf_small}/documents.parquet")
        rows = D.span_dedup_rewrite(docs, n=8).join(
            docs.select("doc_id", "text"), "doc_id"
        ).collect()
        assert len(rows) == docs.count()
        for r in rows:
            orig = r.text.split()
            kept = r.cleaned_text.split() if r.cleaned_text else []
            assert r.n_tokens - r.n_removed == len(kept)
            it = iter(orig)
            assert all(tk in it for tk in kept)  # subsequence check

    def test_repartition_invariance(self, spark, sf_small):
        docs = spark.read.parquet(f"{sf_small}/documents.parquet")
        a = sorted(
            map(tuple, D.span_dedup_rewrite(docs, n=8).collect())
        )
        b = sorted(
            map(
                tuple,
                D.span_dedup_rewrite(docs.repartition(7), n=8).collect(),
            )
        )
        assert a == b


def test_bigram_logprob_scores_semantics(spark):
    """The bigram score must see word ORDER: a scrambled twin of a
    corpus-typical doc scores strictly lower even though its token mix
    (hence its unigram score) is identical; < 2-token docs are absent;
    a doc made of the corpus's dominant collocation scores highest."""
    from postgres_etl_pipeline_spark.operators.text import (
        bigram_logprob_scores,
        unigram_logprob_scores,
    )

    base = "the cat sat on the mat"
    rows = [
        (0, base),
        (1, base),
        (2, base),
        (3, "mat the on sat cat the"),  # same tokens, scrambled order
        (4, "one"),                     # single token: no bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.n_bigrams, r.mean_logprob)
           for r in bigram_logprob_scores(df).collect()}
    assert 4 not in out
    assert out[0] == out[1] == out[2]
    assert out[3][0] == 5  # same bigram count
    assert out[3][1] < out[0][1]  # scrambled order scores strictly lower
    uni = {r.doc_id: r.mean_logprob
           for r in unigram_logprob_scores(df).collect()}
    assert uni[3] == uni[0]  # ...which the unigram score cannot see


# ---------------------------------------------------------------------------
# Sequence packing (round 12): concat-and-chunk spans over a distributed
# prefix sum — the invariants a training loader relies on
# ---------------------------------------------------------------------------


def _pack_rows(df, seq_len, n_parts=None):
    out = X.pack_sequences(df, seq_len=seq_len, n_parts=n_parts)
    return sorted(map(tuple, out.collect()))


def test_pack_sequences_partitions_the_token_stream(spark):
    """Spans tile the concatenated token stream exactly: every sequence
    but the last is full, seq_off runs contiguously inside a sequence,
    per-doc spans are contiguous from 0 to the doc's token count, and
    the result is independent of the partition count (the two-phase
    prefix sum equals the one-window formulation)."""
    import random

    rng = random.Random(7)
    rows = [
        (i, " ".join(f"w{j}" for j in range(rng.randint(1, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    L = 16
    spans = _pack_rows(df, L, n_parts=5)
    # partitioning-independence: 1 partition == 5 partitions == 13
    assert spans == _pack_rows(df, L, n_parts=1)
    assert spans == _pack_rows(df, L, n_parts=13)
    total = sum(len(t.split()) for _i, t in rows)
    n_seqs = -(-total // L)
    by_seq = {}
    for seq_id, doc_id, doc_start, seq_off, n in spans:
        by_seq.setdefault(seq_id, []).append((seq_off, n, doc_id, doc_start))
    assert set(by_seq) == set(range(n_seqs))
    for seq_id, items in by_seq.items():
        items.sort()
        pos = 0
        for seq_off, n, _d, _ds in items:
            assert seq_off == pos and n > 0  # contiguous, no gaps/overlaps
            pos += n
        assert pos == (L if seq_id < n_seqs - 1 else total - L * (n_seqs - 1))
    # per-doc: spans reassemble the doc in order with nothing missing
    by_doc = {}
    for seq_id, doc_id, doc_start, _so, n in spans:
        by_doc.setdefault(doc_id, []).append((doc_start, n, seq_id))
    for (doc_id, text) in rows:
        items = sorted(by_doc[doc_id])
        pos = 0
        last_seq = None
        for doc_start, n, seq_id in items:
            assert doc_start == pos
            if last_seq is not None:
                assert seq_id == last_seq + 1  # boundary docs span ADJACENT seqs
            last_seq = seq_id
            pos += n
        assert pos == len(text.split())


def test_pack_sequences_edge_shapes(spark):
    """One doc longer than several sequences; seq_len=1; empty input."""
    df = spark.createDataFrame(
        [(10, " ".join(["t"] * 37))], "doc_id long, text string"
    )
    spans = _pack_rows(df, 8)
    assert [s[0] for s in spans] == [0, 1, 2, 3, 4]  # 37 toks -> 5 seqs of 8
    assert [s[4] for s in spans] == [8, 8, 8, 8, 5]
    assert all(s[3] == 0 for s in spans)  # each span starts its sequence
    assert _pack_rows(df, 1) == [
        (k, 10, k, 0, 1) for k in range(37)
    ]
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert _pack_rows(empty, 8) == []
    with pytest.raises(ValueError, match="seq_len"):
        X.pack_sequences(df, seq_len=0)


# ---------------------------------------------------------------------------
# Round 13: packing variants — seeded shuffle (verdict r12 item 5) and
# model-token counts (item 6)
# ---------------------------------------------------------------------------


def _span_invariants(spans, doc_tok):
    """Spans partition the token stream AND every document, gap- and
    overlap-free — must hold under ANY document order."""
    total = sum(doc_tok.values())
    L = 16
    by_seq, by_doc = {}, {}
    for seq_id, doc_id, doc_start, seq_off, n in spans:
        by_seq.setdefault(seq_id, []).append((seq_off, n))
        by_doc.setdefault(doc_id, []).append((doc_start, n))
    n_seqs = -(-total // L)
    assert set(by_seq) == set(range(n_seqs))
    for seq_id, items in by_seq.items():
        items.sort()
        pos = 0
        for seq_off, n in items:
            assert seq_off == pos and n > 0
            pos += n
        assert pos == (L if seq_id < n_seqs - 1 else total - L * (n_seqs - 1))
    for doc_id, items in by_doc.items():
        items.sort()
        pos = 0
        for doc_start, n in items:
            assert doc_start == pos
            pos += n
        assert pos == doc_tok[doc_id]


def test_pack_sequences_shuffled_order_and_invariants(spark):
    """shuffle_seed lays documents out in md5(seed:doc_id) order — the
    reconstructed global doc order equals the hashlib-computed one, the
    span invariants hold, the result is partitioning-independent, and a
    different seed gives a different (still valid) permutation."""
    import hashlib
    import random

    rng = random.Random(13)
    rows = [
        (i, " ".join(f"w{j}" for j in range(rng.randint(1, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    doc_tok = {i: len(t.split()) for i, t in rows}
    L = 16

    def spans_for(seed, n_parts):
        out = X.pack_sequences(
            df, seq_len=L, n_parts=n_parts, shuffle_seed=seed
        )
        return sorted(map(tuple, out.collect()))

    spans = spans_for(42, 5)
    assert spans == spans_for(42, 1) == spans_for(42, 13)
    _span_invariants(spans, doc_tok)
    # global doc order from the span map: ascending first-token offset
    start = {
        d: s * L + so for s, d, ds, so, _n in spans if ds == 0
    }
    got_order = [d for d in sorted(start, key=start.get)]
    want_order = sorted(
        doc_tok,
        key=lambda d: (hashlib.md5(f"42:{d}".encode()).hexdigest(), d),
    )
    assert got_order == want_order
    other = spans_for(7, 5)
    _span_invariants(other, doc_tok)
    assert other != spans  # a different seed is a different permutation


def test_pack_sequences_bpe_and_precomputed_counts(spark):
    """count_mode='bpe' measures spans with the BPE pre-tokenizer (so
    punctuation-heavy docs occupy more of a sequence than their
    whitespace count says); n_tok_col wins over both modes; bad
    count_mode raises."""
    rows = [
        (0, "hello, world!"),          # ws 2, bpe 4: hello , world !
        (1, "a b2c"),                  # ws 2, bpe 4: a b 2 c
        (2, "plain words here"),       # ws 3 == bpe 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    ws = sorted(map(tuple, X.pack_sequences(df, seq_len=4).collect()))
    assert sum(s[4] for s in ws) == 7
    bpe = sorted(
        map(tuple, X.pack_sequences(df, seq_len=4, count_mode="bpe").collect())
    )
    assert sum(s[4] for s in bpe) == 11
    _span = {d: [] for d in (0, 1, 2)}
    for _s, d, _ds, _so, n in bpe:
        _span[d].append(n)
    assert sum(_span[0]) == 4 and sum(_span[1]) == 4 and sum(_span[2]) == 3
    pre = df.withColumn("my_counts", F.lit(5))
    fixed = sorted(map(tuple, X.pack_sequences(
        pre, seq_len=5, n_tok_col="my_counts", count_mode="bpe"
    ).collect()))
    # 3 docs x 5 tokens at L=5: each doc IS one sequence, n_tok_col wins
    assert fixed == [(k, k, 0, 0, 5) for k in range(3)]
    with pytest.raises(ValueError, match="count_mode"):
        X.pack_sequences(df, seq_len=4, count_mode="chars")


# ---------------------------------------------------------------------------
# Round 13 (verdict r12 item 7): shingle size is a parameter
# ---------------------------------------------------------------------------


def test_shingles_any_n_match_python_ngrams(spark):
    """shingles(n) for n in {1,2,3,5} equals the straightforward python
    n-gram derivation on the same whitespace canon."""
    rows = [
        (0, "the cat sat on the mat"),
        (1, "  spaced   out\ttokens "),
        (2, "short"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (1, 2, 3, 5):
        got = {
            r.doc_id: list(r.sh)
            for r in df.select(
                "doc_id", D.shingles("text", n=n).alias("sh")
            ).collect()
        }
        for doc_id, text in rows:
            # the engine's whitespace canon: split('') is [''] — empty
            # text carries ONE empty token (visible only at n=1; every
            # n>=2 slice is empty either way)
            toks = text.split() or [""]
            want = [
                " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
            ]
            assert got[doc_id] == want, (n, doc_id)
    with pytest.raises(ValueError, match="n must be >= 1"):
        D.shingles("text", n=0)


def test_jaccard_pairs_any_n_match_python_oracle(spark):
    """jaccard_pairs at n in {2, 5} equals the python set-Jaccard oracle
    over distinct n-gram shingles — the same capped posting-list
    machinery serves every n (verdict r12 item 7 'done' condition)."""
    rows = [
        (0, "a b c d e f g"),
        (1, "a b c d e f h"),
        (2, "a b c d e f g"),   # exact dup of 0
        (3, "z y x w v u t s"),
        (4, "a b"),             # shorter than a 5-gram: no 5-shingles
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (2, 5):
        sets = {
            i: {
                " ".join(t.split()[k:k + n])
                for k in range(len(t.split()) - n + 1)
            }
            for i, t in rows
        }
        want = {}
        for i in sets:
            for j in sets:
                if i < j and sets[i] and sets[j]:
                    inter = len(sets[i] & sets[j])
                    if inter:
                        jac = inter / len(sets[i] | sets[j])
                        if jac >= 0.1:
                            want[(i, j)] = round(jac, 4)
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in D.jaccard_pairs(df, threshold=0.1, n=n).collect()
        }
        assert got == want, n
