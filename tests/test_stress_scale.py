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
