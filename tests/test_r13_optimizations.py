"""Round-13 optimization regression tests: the plan shapes the r13
rewrites promise (values are pinned by the existing oracle-parity and
recompute tests — these assert the EXECUTION shapes so a refactor
cannot silently reintroduce the removed work)."""

import os

from pyspark.sql import functions as F

from pinterest_data_pipeline400_spark.generator import fixture_dir_for
from pinterest_data_pipeline400_spark.plans.training_data import norm_text
from tests.conftest import TEST_SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_repeated_spans_is_single_pass_no_join(spark):
    """The duplicated-window test is a count window over fp, not an
    aggregate + join-back: the fingerprint projection must appear in a
    JOIN-FREE plan (one fp exchange), so the O(tokens*w) md5 hashing
    runs once per call instead of twice (r13: 2.7 -> 1.6 s sf0.1)."""
    from pinterest_data_pipeline400_spark.operators.dedup import repeated_spans

    fx = fixture_dir_for(TEST_SF_DIR)
    sp = spark.read.parquet(os.path.join(fx, "docs_spans.parquet"))
    normed = sp.select("doc_id", norm_text(F.col("text")).alias("norm"))
    plan = _plan(repeated_spans(normed))
    assert "Join" not in plan  # was: hits = wins JOIN dup(fp)
    assert "CartesianProduct" not in plan


def test_repeated_span_sources_is_single_pass_no_join(spark):
    """Source attribution rides the same single fp window pass: occ +
    min(doc_id) as plain windows, distinct hosts via the
    max(dense_rank) identity — still no join anywhere."""
    from pinterest_data_pipeline400_spark.operators.dedup import (
        repeated_span_sources,
    )

    fx = fixture_dir_for(TEST_SF_DIR)
    sp = spark.read.parquet(os.path.join(fx, "docs_spans.parquet"))
    normed = sp.select("doc_id", norm_text(F.col("text")).alias("norm"))
    plan = _plan(repeated_span_sources(normed))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_lshe_band_keys_cached_for_self_join(spark):
    """The (g, mh) self-join's two sides must read the PERSISTED key
    frame (InMemoryTableScan on both sides) instead of recomputing the
    24-band signature pipeline twice (r13: 5.7 -> 2.3 s sf0.1)."""
    from pinterest_data_pipeline400_spark.operators.dedup import (
        containment_lshe_pairs,
    )

    fx = fixture_dir_for(TEST_SF_DIR)
    dup = spark.read.parquet(os.path.join(fx, "docs_dup.parquet"))
    normed = dup.select("doc_id", norm_text(F.col("text")).alias("norm"))
    plan = _plan(containment_lshe_pairs(normed, eager=False))
    assert plan.count("InMemoryTableScan") >= 2
    assert "CartesianProduct" not in plan
    spark.catalog.clearCache()


def test_ablation_shares_one_verified_spine(spark):
    """docs_dedup_ablation passes ONE bottomk_verified_pairs frame to
    both signature families and ONE persisted shingle frame to the
    minhash/simhash/bottom-k builders; the shared-frame path must
    produce byte-identical family rows (the standalone entries keep
    their own self-contained spines — their plans are untouched)."""
    from pinterest_data_pipeline400_spark.operators.dedup import (
        bottomk_verified_pairs,
        containment_sig_pairs,
        ngram_jaccard_sig_pairs,
        shingle_docs,
    )

    fx = fixture_dir_for(TEST_SF_DIR)
    dup = spark.read.parquet(os.path.join(fx, "docs_dup.parquet"))
    normed = dup.select("doc_id", norm_text(F.col("text")).alias("norm"))
    spread = normed.repartition(spark.sparkContext.defaultParallelism)
    shingled = shingle_docs(spread).persist()
    v = bottomk_verified_pairs(normed, shingled=shingled)
    for shared, standalone in (
        (
            ngram_jaccard_sig_pairs(normed, verified=v),
            ngram_jaccard_sig_pairs(normed),
        ),
        (
            containment_sig_pairs(normed, verified=v),
            containment_sig_pairs(normed),
        ),
    ):
        a = shared.toPandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
        b = (
            standalone.toPandas()
            .sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True)
        )
        assert a.equals(b)
    spark.catalog.clearCache()


def test_docfreq_window_rewrites_are_join_free(spark):
    """docs_cdc_chunks / docs_ngram_novelty / docs_remove_common_spans:
    the per-key docfreq rides a window on the single key exchange
    instead of an aggregate + join-back, so the expensive upstream
    (chunking windows / interpreted shingling / span explode) runs once
    per call instead of twice. The only join remaining in
    remove_common_spans is the per-doc cov LEFT JOIN (doc-keyed, not
    the span join this rewrite removed)."""
    from pinterest_data_pipeline400_spark.plans import curation as cu
    from pinterest_data_pipeline400_spark.plans import training_data as td

    plan = _plan(cu.docs_cdc_chunks(spark, TEST_SF_DIR))
    assert "Join" not in plan
    plan = _plan(td.docs_ngram_novelty(spark, TEST_SF_DIR))
    assert "Join" not in plan
    plan = _plan(td.docs_remove_common_spans(spark, TEST_SF_DIR))
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") + plan.count(
        "ShuffledHashJoin"
    ) == 1  # the doc-keyed cov join only
    assert "CartesianProduct" not in plan


def test_gapfill_doubling_recursion_matches_seq_twin(spark):
    """The doubling-span recursion (log2(range) jobs instead of one per
    day) must produce the identical dense spine as the sequence() twin
    — full-row equality, the cover-completeness proof in test form."""
    from pinterest_data_pipeline400_spark.plans import events_queries as eq

    rec = (
        eq.ev_daily_gapfill(spark, TEST_SF_DIR)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    seq = (
        eq.ev_daily_gapfill_seq(spark, TEST_SF_DIR)
        .toPandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    assert rec.equals(seq)
    # the spine is dense: consecutive ISO days, no dup, no gap
    import datetime

    days = [datetime.date.fromisoformat(d) for d in rec.day]
    assert days == [days[0] + datetime.timedelta(days=i) for i in range(len(days))]
