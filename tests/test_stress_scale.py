"""Scale-up smoke for the dedup spine (env-gated: SPARK_GRAFT_STRESS=1).

The parity suite proves CORRECTNESS at sf0.001-0.01; this proves the
SHAPE claims survive a real size jump: the docs_dup corpus replicated
40x (~50k docs) with per-replica token perturbation strong enough that
replicas never cross-match (every 3rd token tagged -> Jaccard ~0.33,
far under tau 0.5), so the true pair count scales LINEARLY with
corpus size. If candidate generation were quadratic (all-pairs or a
hot LSH bucket), this run would blow up in time and pair count; the
assertions pin both. Run manually / per round:

    SPARK_GRAFT_STRESS=1 python -m pytest tests/test_stress_scale.py -q

Round-5 measurement on local[8], sf0.01 base x40 = 49,720 docs:
minhash pairs + connected components + keeper rollup in 10.5 s wall,
6,119 pairs (~40x the base 154; +/-5% from borderline near-dup
Jaccards shifting under perturbation), 10,960 cluster members, ZERO
cross-replica pairs.

Round-6 ANN measurement on local[8], sf0.01 embeddings x40 = 20,000
vectors, 8 fixed queries: band-join candidates 1,226 at 1x ->
49,352 at 40x = exactly 40x + the (REPLICAS-1)*N_QUERIES
replica-self term; candidate fraction ~0.307 constant; well under
the 120 s wall ceiling (~20 s total including the 1x baseline).
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from tests.conftest import TEST_SF_DIR

REPLICAS = 40
pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_STRESS"),
    reason="stress run is opt-in (SPARK_GRAFT_STRESS=1); ~1 min wall",
)


def test_dedup_spine_scales_linearly(spark):
    from pinterest_data_pipeline400_spark.generator import fixture_dir_for
    from pinterest_data_pipeline400_spark.operators.dedup import (
        dup_clusters,
        minhash_near_dup_pairs,
    )
    from pinterest_data_pipeline400_spark.plans.training_data import norm_text

    base = spark.read.parquet(
        os.path.join(fixture_dir_for(TEST_SF_DIR), "docs_dup.parquet")
    )
    n_base = base.count()
    base_pairs = minhash_near_dup_pairs(
        base.select("doc_id", norm_text(F.col("text")).alias("norm"))
    ).count()

    # 40 replicas; every 3rd token gets a replica tag so cross-replica
    # Jaccard lands ~0.33 (< tau 0.5) while within-replica planted
    # dups keep their relationship (both members perturbed identically).
    big = (
        base.crossJoin(F.broadcast(spark.range(REPLICAS).select(F.col("id").alias("rep"))))
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            F.array_join(
                F.expr(
                    "transform(split(text, ' '), (t, i) -> "
                    "IF(i % 3 = 0, concat('r', rep, '_', t), t))"
                ),
                " ",
            ).alias("norm"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    t0 = time.perf_counter()
    pairs = minhash_near_dup_pairs(
        big.select("doc_id", norm_text(F.col("norm")).alias("norm"))
    ).persist()
    clusters = dup_clusters(pairs)
    n_pairs = pairs.count()
    n_cross = pairs.filter(
        (F.col("doc_a") / 1_000_000).cast("long")
        != (F.col("doc_b") / 1_000_000).cast("long")
    ).count()
    n_members = clusters.count()
    n_keepers = clusters.filter("is_keeper").count()
    wall = time.perf_counter() - t0

    assert big.count() == n_base * REPLICAS
    # The linearity property itself: ZERO cross-replica pairs — every
    # match stays inside its replica, so pair volume grows with corpus
    # size, not its square. (A hot LSH bucket or all-pairs plan would
    # flood this with cross matches.)
    assert n_cross == 0, f"{n_cross} cross-replica pairs leaked"
    # ~40x the base pair count; identical perturbation shifts a few
    # borderline NEAR-dup Jaccards across the 0.5 threshold per
    # replica, so allow 5% drift around exact linearity
    assert abs(n_pairs - base_pairs * REPLICAS) <= 0.05 * base_pairs * REPLICAS, (
        n_pairs,
        base_pairs,
    )
    assert 0 < n_keepers < n_members
    # generous wall ceiling: catches quadratic regressions (an
    # all-pairs plan at 50k docs is ~1.2B comparisons), not jitter
    assert wall < 300, f"dedup spine took {wall:.0f}s at {REPLICAS}x"
    pairs.unpersist()


def test_ann_band_join_scales_linearly(spark):
    """ANN twin of the dedup stress run (VERDICT r5 task #5): the
    emb_knn_lsh/emb_decontaminate candidate generator — a band-key
    equi-join with the (fixed-size) query side broadcast — must
    produce candidate volume LINEAR in corpus size: bucket occupancy
    grows with n, the query set does not, so candidates/query scale
    ~REPLICAS x and the candidate FRACTION (pairs / (queries*corpus))
    stays ~constant. An all-pairs or hot-bucket-degenerate plan would
    grow the fraction with n and blow the wall ceiling."""
    from pinterest_data_pipeline400_spark.operators.dedup import _emb_band_keys
    from pinterest_data_pipeline400_spark.plans.training_data import (
        LSH_KNN_BANDS,
        LSH_KNN_BITS,
        N_QUERIES,
        _embs,
    )

    base = _embs(spark, TEST_SF_DIR)
    n_base = base.count()

    def keyed(df):
        return df.select(
            "vec_id",
            F.explode(
                F.array(
                    *_emb_band_keys("embedding", bands=LSH_KNN_BANDS, bits=LSH_KNN_BITS)
                )
            ).alias("band_key"),
        )

    q = keyed(base.filter(F.col("vec_id") < N_QUERIES)).select(
        F.col("vec_id").alias("qid"), "band_key"
    )

    def n_candidates(corpus) -> int:
        return (
            keyed(corpus)
            .join(F.broadcast(q), on="band_key")
            .filter(F.col("vec_id") != F.col("qid"))
            .select("qid", "vec_id")
            .distinct()
            .count()
        )

    cand_1x = n_candidates(base)

    big = (
        base.crossJoin(
            F.broadcast(spark.range(REPLICAS).select(F.col("id").alias("rep")))
        )
        .select((F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"), "embedding")
        .repartition(spark.sparkContext.defaultParallelism)
    )
    t0 = time.perf_counter()
    cand_40x = n_candidates(big)
    wall = time.perf_counter() - t0

    assert big.count() == n_base * REPLICAS
    # candidate volume linear in corpus size (queries fixed): the
    # replicated corpus multiplies every bucket's occupancy by exactly
    # REPLICAS, so candidates = REPLICAS * base, plus the (REPLICAS-1)
    # re-keyed copies of each query vector itself that the vec_id !=
    # qid guard no longer removes (self-matches only drop for the
    # original ids)
    assert cand_40x == REPLICAS * cand_1x + (REPLICAS - 1) * N_QUERIES, (
        cand_1x,
        cand_40x,
    )
    # candidate fraction ~unchanged => never all-pairs (the exact-count
    # assert above is the strict form; the residual here is exactly the
    # replica-self term (REPLICAS-1)*N_QUERIES over the pair space)
    frac_1x = cand_1x / (N_QUERIES * n_base)
    frac_40x = cand_40x / (N_QUERIES * n_base * REPLICAS)
    assert abs(frac_40x - frac_1x) <= (REPLICAS - 1) / (n_base * REPLICAS) + 1e-9, (
        frac_1x,
        frac_40x,
    )
    assert wall < 120, f"ANN band join took {wall:.0f}s at {REPLICAS}x"


def test_pq_adc_scales_linearly(spark):
    """PQ twin of the ANN stress run: asymmetric-distance search cost
    must be LINEAR in corpus size with a fixed query set — the encoded
    corpus carries exactly PQ_SUBS rows per vector, the per-query LUT
    is constant-size, and the ADC accumulation produces exactly
    |queries| x (n-1) scored pairs. Exercises the REGISTERED builders
    (_pq_subspaces/_pq_encode/_pq_adc_scores — the same code
    emb_knn_pq_adc runs), so a fan-out bug in the (sub, code) join
    (e.g. joining on code alone) fails HERE, not just in a copy; wall
    is the 40x datapoint recorded in PERF.md."""
    from pinterest_data_pipeline400_spark.plans.training_data import (
        N_QUERIES,
        PQ_SUBS,
        _embs,
        _pq_adc_scores,
        _pq_codebook,
        _pq_encode,
        _pq_subspaces,
    )

    def counts(corpus) -> tuple[int, int]:
        subs = _pq_subspaces(corpus)
        enc = _pq_encode(subs, _pq_codebook(subs))
        return _pq_adc_scores(corpus).count(), enc.count()

    base = _embs(spark, TEST_SF_DIR)
    n_base = base.count()
    pairs_1x, enc_1x = counts(base)
    assert enc_1x == PQ_SUBS * n_base
    assert pairs_1x == N_QUERIES * (n_base - 1)

    big = (
        base.crossJoin(
            F.broadcast(spark.range(REPLICAS).select(F.col("id").alias("rep")))
        )
        .select(
            (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"), "embedding"
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    n_big = n_base * REPLICAS
    t0 = time.perf_counter()
    pairs_40x, enc_40x = counts(big)
    wall = time.perf_counter() - t0

    # exactly linear: PQ_SUBS codes per vector, |queries| x (n-1)
    # scored pairs (the replicas' copies of the query vectors keep
    # their offset ids, so only the original self-match drops)
    assert enc_40x == PQ_SUBS * n_big
    assert pairs_40x == N_QUERIES * (n_big - 1)
    assert wall < 120, f"PQ ADC took {wall:.0f}s at {REPLICAS}x"


def test_events_sessionization_scales_linearly(spark):
    """Events-family twin of the dedup/ANN stress runs: sessionization
    partitions per user, so a 40x corpus with DISJOINT replica user
    ids must produce exactly 40x the sessions with the identical
    per-session event distribution — and, because per-user partitions
    stay the same size, wall time must stay linear (a plan that
    globally sorted, or keyed state on anything coarser than user_id,
    would blow the ceiling)."""
    from pinterest_data_pipeline400_spark.plans.events_queries import (
        _events,
        ev_sessionization,
    )

    base = _events(spark, TEST_SF_DIR).select("user_id", "ts", "event_id")
    base_sessions = ev_sessionization(spark, TEST_SF_DIR)
    n_sess = base_sessions.count()
    n_events = int(
        base_sessions.agg(F.sum("n_events").cast("long")).collect()[0][0]
    )

    big = (
        base.crossJoin(
            F.broadcast(spark.range(REPLICAS).select(F.col("id").alias("rep")))
        )
        .select(
            (F.col("user_id") + F.col("rep") * 10_000_000).alias("user_id"),
            "ts",
            (F.col("event_id") + F.col("rep") * 1_000_000_000).alias("event_id"),
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # inline the registered window chain over the replicated frame
    # (ev_sessionization is path-bound to the fixture; the chain below
    # is the same expressions with the same SESSION_GAP_SEC)
    from pinterest_data_pipeline400_spark.plans.events_queries import SESSION_GAP_SEC
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_sec = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    t0 = time.perf_counter()
    sess = (
        big.withColumn(
            "is_new",
            F.when(
                F.lag("ts").over(w).isNull() | (gap_sec > SESSION_GAP_SEC), 1
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("is_new").over(run))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got = sess.agg(
        F.count(F.lit(1)).cast("long"), F.sum("n_events").cast("long")
    ).collect()[0]
    wall = time.perf_counter() - t0

    assert int(got[0]) == REPLICAS * n_sess
    assert int(got[1]) == REPLICAS * n_events
    assert wall < 120, f"sessionization took {wall:.0f}s at {REPLICAS}x"


def test_bm25_postings_scale_linearly(spark):
    """Lexical-search family: the BM25 scored frame at 40x the corpus.
    Replicas carry IDENTICAL text under fresh doc_ids, so (a) the
    matched-postings row count must be exactly 40x the base (the
    query-term filter prunes before aggregation — an unfiltered
    corpus-wide aggregate would also pass this count but blow the wall
    ceiling), and (b) all 40 replicas of a base doc must land the SAME
    integer score (tf/dl identical; df and N both scale 40x so every
    score input is replica-invariant) — a partitioning- or
    fold-order-sensitive score would split them."""
    from pinterest_data_pipeline400_spark.plans.training_data import bm25_scored

    base = spark.read.parquet(os.path.join(TEST_SF_DIR, "documents.parquet"))
    n_matched = bm25_scored(base.select("doc_id", "text")).count()

    big = (
        base.crossJoin(
            F.broadcast(spark.range(REPLICAS).select(F.col("id").alias("rep")))
        )
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"), "text"
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    t0 = time.perf_counter()
    scored = bm25_scored(big).persist()
    n_big = scored.count()
    split_scores = (
        scored.groupBy((F.col("doc_id") % 10_000_000).alias("base_id"))
        .agg(F.countDistinct("score_nano").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    wall = time.perf_counter() - t0

    assert n_big == REPLICAS * n_matched, (n_big, n_matched)
    assert split_scores == 0, f"{split_scores} base docs got divergent scores"
    assert wall < 120, f"bm25 scoring took {wall:.0f}s at {REPLICAS}x"
    scored.unpersist()


def test_pagerank_users_scales_with_edges_not_rounds(spark):
    """Link-analysis stress datapoint (VERDICT r8 task #2): the
    user-grain power iteration's per-round cost must scale with the
    EDGE count, linearly in rounds — not rounds^2 (the lineage-blowup
    failure mode localCheckpoint exists to prevent). Two measurements
    on a replicated corpus (per-replica event types keep the streams
    disjoint, so edges and nodes replicate exactly):

    * edge/node linearity: the replicated graph has exactly REPLICAS x
      the base edge count and zero cross-replica edges;
    * rounds linearity: wall(4 rounds) vs wall(2 rounds) on the SAME
      graph isolates the per-round cost — with per-round lineage cuts
      the ratio sits near (f + 4c) / (f + 2c) < 2; a re-derive-from-
      corpus loop compounds per round and blows the ceiling.
    """
    from pinterest_data_pipeline400_spark.plans.events_queries import (
        _events,
        _pagerank_users_train_on,
    )

    pr_reps = 8
    ev = _events(spark, TEST_SF_DIR).select(
        "user_id", "ts", "event_id", "event_type"
    )
    base_edges = (
        ev.withColumn(
            "to_user",
            F.expr(
                "lead(user_id) OVER (PARTITION BY event_type"
                " ORDER BY ts, event_id)"
            ),
        )
        .filter("to_user IS NOT NULL AND to_user != user_id")
        .select(F.col("user_id").alias("from_user"), "to_user")
        .distinct()
        .count()
    )
    big = (
        ev.crossJoin(
            F.broadcast(spark.range(pr_reps).select(F.col("id").alias("rep")))
        )
        .select(
            (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
            "ts",
            (F.col("event_id") + F.col("rep") * 1_000_000_000).alias("event_id"),
            F.concat(F.lit("r"), F.col("rep"), F.lit("_"), F.col("event_type")).alias(
                "event_type"
            ),
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    big.count()  # materialize outside the timers

    edges_big = (
        big.withColumn(
            "to_user",
            F.expr(
                "lead(user_id) OVER (PARTITION BY event_type"
                " ORDER BY ts, event_id)"
            ),
        )
        .filter("to_user IS NOT NULL AND to_user != user_id")
        .select(F.col("user_id").alias("from_user"), "to_user")
    ).persist()
    n_cross = edges_big.filter(
        (F.col("from_user") / 1_000_000).cast("long")
        != (F.col("to_user") / 1_000_000).cast("long")
    ).count()
    n_edges_big = edges_big.distinct().count()
    assert n_cross == 0, f"{n_cross} cross-replica edges leaked"
    assert n_edges_big == pr_reps * base_edges, (base_edges, n_edges_big)
    edges_big.unpersist()

    t0 = time.perf_counter()
    _pagerank_users_train_on(big, rounds=2).write.format("noop").mode(
        "overwrite"
    ).save()
    wall2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out4 = _pagerank_users_train_on(big, rounds=4)
    out4.write.format("noop").mode("overwrite").save()
    wall4 = time.perf_counter() - t0
    big.unpersist()
    # linear-in-rounds: generous 2.6x ceiling (exact lineage blowup
    # compounds far past this; jitter stays well under it)
    assert wall4 < 2.6 * wall2 + 2.0, (wall2, wall4)
    assert wall4 < 120, f"4-round pagerank took {wall4:.0f}s at {pr_reps}x"
