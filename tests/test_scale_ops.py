"""Scale-technique operators: bucketed joins must be shuffle-free,
salted joins must be value-identical to plain joins while spreading the
hot key."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pinterest_data_pipeline400_spark.operators.scale import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from tests.conftest import TEST_SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def orders_customers(spark):
    orders = spark.range(2000).select(
        F.col("id").alias("o_id"), (F.col("id") % 100).alias("cust"), F.lit(1.5).alias("amt")
    )
    custs = spark.range(100).select(
        F.col("id").alias("cust"), F.concat(F.lit("c"), F.col("id")).alias("name")
    )
    return orders, custs


def test_bucketed_join_has_no_exchange(spark, orders_customers):
    """The co-location contract: same bucket spec on both sides ⇒ the
    join plans with ZERO Exchange operators (at 100 TB this deletes the
    shuffle that dominates fact⋈fact joins)."""
    orders, custs = orders_customers
    write_bucketed(orders, "b_orders", ["cust"], num_buckets=8)
    write_bucketed(custs, "b_custs", ["cust"], num_buckets=8)
    joined = bucketed_join(spark, "b_orders", "b_custs", on=["cust"], force_sort_merge=True)
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan
    assert joined.count() == 2000


def test_bucketed_join_matches_plain_join(spark, orders_customers):
    orders, custs = orders_customers
    write_bucketed(orders, "b_orders2", ["cust"], num_buckets=8)
    write_bucketed(custs, "b_custs2", ["cust"], num_buckets=8)
    a = bucketed_join(spark, "b_orders2", "b_custs2", on=["cust"]).toPandas()
    b = orders.join(custs, on="cust").toPandas()
    key = ["cust", "o_id"]
    assert a.sort_values(key, ignore_index=True)[sorted(a.columns)].equals(
        b.sort_values(key, ignore_index=True)[sorted(b.columns)]
    )


def test_salted_join_is_value_identical(spark):
    """90% of rows share one hot key — the canonical power-law shape
    (the reference's single Kinesis partition key). Salted output must
    equal the plain join exactly."""
    rows = [(i, 0 if i % 10 else i % 7) for i in range(1000)]
    big = spark.createDataFrame(rows, "row_id int, k int")
    small = spark.createDataFrame([(i, f"v{i}") for i in range(7)], "k int, v string")
    plain = big.join(small, on="k").toPandas()
    salted = salted_join(big, small, on="k", salt=8).toPandas()
    key = ["k", "row_id"]
    assert salted.sort_values(key, ignore_index=True)[sorted(salted.columns)].equals(
        plain.sort_values(key, ignore_index=True)[sorted(plain.columns)]
    )


def test_salted_join_spreads_hot_key(spark):
    """The mechanism itself: after salting, the hot key's rows occupy
    multiple (key, salt) groups instead of one."""
    big = spark.createDataFrame([(i, 0) for i in range(500)], "row_id int, k int")
    salted = big.withColumn("__salt", (F.rand(seed=0) * 8).cast("int"))
    n_groups = salted.select("k", "__salt").distinct().count()
    assert n_groups >= 6  # hot key spread across most of the 8 salt buckets


def test_salted_join_hash_joins_when_broadcast_disabled(spark):
    """The salting claim's real test (a tiny dim broadcast-joins at
    fixture scale, which salting can't demonstrate anything on): with
    the broadcast threshold forced off, the salted join must compile to
    a shuffle join ON THE SALTED KEY — (k, __salt) both in the join
    keys — spreading each hot key over the salt sub-partitions."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        big = spark.range(1000).select(
            (F.col("id") % 3).alias("k"), F.col("id").alias("v")
        )
        small = spark.range(3).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        joined = salted_join(big, small, on="k", salt=8)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "__salt" in plan  # the shuffle keys include the salt
        # and the result is still exactly the plain join
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_aqe_skew_join_splits_hot_partition(spark):
    """The third skew lever (after salting and bucketing) is AQE's
    runtime skew-join split — claimed throughout the scale notes, so
    prove it ENGAGES: with split thresholds lowered to fixture scale, a
    join against a 100:1-skewed key must show skew=true in the final
    adaptive plan (the hot partition was split into subpartitions at
    runtime, no code change on the query)."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
    }
    prev = {}
    for k, v in confs.items():
        try:
            prev[k] = spark.conf.get(k)
        except Exception:
            prev[k] = None
        spark.conf.set(k, v)
    try:
        # key 0 holds ~99% of the rows; wide payload makes bytes skew too
        big = spark.range(200_000).select(
            F.when(F.col("id") % 100 == 0, F.col("id") % 7).otherwise(0).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id")).alias("payload"),
        )
        right = spark.range(7).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("w")
        )
        # no aggregation downstream: AQE declines to split a skewed join
        # whose output partitioning a later operator still needs. The
        # plan must be read from the SAME QueryExecution that ran —
        # .write would execute a copy and leave this one un-finalized.
        joined = big.join(right, on="k").select(F.sum(F.length("payload")))
        joined.collect()
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """Runtime row-level filtering (Spark's InjectRuntimeFilter): when a
    shuffle join's small side carries a selective predicate, the
    optimizer builds a bloom filter over its join keys and pushes a
    might_contain probe into the BIG side's scan leg — rows that cannot
    match are dropped before the shuffle, the at-scale win for
    selective dim-fact joins that are too big to broadcast. At 100 TB
    the 10 GB application-side default engages this naturally; the test
    lowers that threshold so the fixture-scale plan qualifies, then
    asserts the filter is INJECTED and the result unchanged."""
    prev = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        def build():
            # a DataFrame pins its QueryExecution at first use, so each
            # conf regime needs a freshly built plan
            big = spark.read.parquet(f"{TEST_SF_DIR}/lineitem.parquet")
            dim = (
                spark.read.parquet(f"{TEST_SF_DIR}/orders.parquet")
                .filter(F.col("o_totalprice") > 400000)
                .select("o_orderkey")
            )
            return big.join(dim, big.l_orderkey == dim.o_orderkey).select(
                "l_orderkey", "l_quantity"
            )

        baseline = build().count()
        plan_off = build()._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" not in plan_off  # default 10GB gate: not yet

        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        filtered = build()
        plan_on = filtered._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan_on and "bloom_filter_agg" in plan_on
        assert filtered.count() == baseline  # pruning is semantics-free
    finally:
        for k, old in prev.items():
            if old is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, old)


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    """Compaction contract: a 32-file table becomes the computed number
    of right-sized files, row content identical, and clustering by the
    filter key tightens row-group stats (sortWithinPartitions runs
    without a global shuffle — no Exchange in the write plan)."""
    from pinterest_data_pipeline400_spark.operators.scale import compact_parquet

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    base = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.sha1(F.col("id").cast("string")).alias("pad")
    )
    base.repartition(32).write.parquet(src)
    n_src_files = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_src_files == 32

    total = sum(
        os.path.getsize(os.path.join(src, f))
        for f in os.listdir(src) if f.endswith(".parquet")
    )
    target = total // 3  # force a multi-file (but much smaller) layout
    n_out = compact_parquet(spark, src, dst, target_file_bytes=target,
                            sort_within_by=["k"])
    n_dst_files = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_dst_files == n_out < n_src_files

    a = spark.read.parquet(src).orderBy("id").toPandas()
    b = spark.read.parquet(dst).orderBy("id").toPandas()
    assert a.equals(b)

    # the coalesce path must not shuffle: no Exchange in the plan
    plan = (
        spark.read.parquet(src).coalesce(n_out).sortWithinPartitions("k")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_zorder_layout_prunes_on_both_dimensions(spark):
    """The Z-order clustered events copy must yield parquet file stats
    tight in BOTH dimensions: for the entry's box predicate, few files'
    [min,max] envelopes intersect the user range, the day range, or
    the box — that file-skip ratio IS the operator's value at 100 TB.
    Measured from the footers directly (engine-independent), at sf0.01
    where both domains are wide enough to cluster (at sf0.001 the
    user domain is only 15 values across 32 files, so every file
    spans it)."""
    import glob

    import pyarrow.parquet as pq

    from pinterest_data_pipeline400_spark.plans import events_queries as eq

    d = eq._zordered_events_dir(spark, "/root/testdata/sf0.01")
    files = sorted(glob.glob(d + "/part-*.parquet"))
    assert len(files) == 32
    hit_u = hit_d = hit_box = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        cols = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }

        def span(col):
            lo = min(
                md.row_group(g).column(cols[col]).statistics.min
                for g in range(md.num_row_groups)
            )
            hi = max(
                md.row_group(g).column(cols[col]).statistics.max
                for g in range(md.num_row_groups)
            )
            return lo, hi

        ulo, uhi = span("user_id")
        dlo, dhi = span("day")
        u = not (uhi < eq.ZORDER_USER_LO or ulo > eq.ZORDER_USER_HI)
        dd = not (dhi < eq.PRUNE_DAY_LO or dlo > eq.PRUNE_DAY_HI)
        hit_u += u
        hit_d += dd
        hit_box += u and dd
    # measured: 5 / 21 / 3 of 32 — assert with headroom against
    # sampling jitter in repartitionByRange
    assert hit_u <= 12, hit_u
    assert hit_d <= 26, hit_d
    assert hit_box <= 8, hit_box


def test_salted_join_left_and_anti_match_plain_join(spark):
    """Salting must preserve semantics for the big-side-preserving
    join family, including big rows with NO match (left: one
    null-extended row, never `salt` copies; anti: exactly the
    unmatched keys)."""
    import pandas as pd
    from pyspark.sql import functions as F

    big = spark.range(200).select(
        (F.col("id") % 12).alias("k"), F.col("id").alias("v")
    )
    small = spark.range(7).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    for how in ("left", "left_anti"):
        plain = big.join(small, on="k", how=how).toPandas()
        salted = salted_join(big, small, on="k", salt=8, how=how).toPandas()
        cols = sorted(plain.columns)
        a = plain[cols].sort_values(cols, ignore_index=True)
        b = salted[cols].sort_values(cols, ignore_index=True)
        pd.testing.assert_frame_equal(a, b), how


def test_salted_join_rejects_outer_forms(spark):
    """right/full outer would surface up to `salt` null-extended copies
    of every unmatched small row — must be an explicit error, not a
    silently corrupt result."""
    from pyspark.sql import functions as F

    big = spark.range(10).select((F.col("id") % 3).alias("k"))
    small = spark.range(5).select(F.col("id").alias("k"))
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(big, small, on="k", how=how)


def test_salted_join_survives_caller_salt_column(spark):
    """A pre-existing __salt column on either input must pass through
    untouched, never be clobbered or used as the join key."""
    from pyspark.sql import functions as F

    big = spark.range(50).select(
        (F.col("id") % 5).alias("k"), F.lit(99).alias("__salt")
    )
    small = spark.range(5).select(F.col("id").alias("k"), F.lit(-1).alias("w"))
    out = salted_join(big, small, on="k", salt=4).toPandas()
    assert "__salt" in out.columns
    assert (out["__salt"] == 99).all()
    assert len(out) == 50


def test_compact_parquet_refuses_in_place(spark, tmp_path):
    from pinterest_data_pipeline400_spark.operators.scale import compact_parquet

    src = str(tmp_path / "t")
    spark.range(10).write.parquet(src)
    with pytest.raises(ValueError, match="overwrite its own source"):
        compact_parquet(spark, src, src)


def test_benford_screen_arithmetic_and_fires_on_uniform_prices(spark):
    """Benford screen contracts: observed digit counts sum to the order
    count, expectations sum to ~n (the nine Benford shares sum to 1),
    the chi-square total equals the sum of the per-digit integer terms,
    and — the honest fixture reading — uniform synthetic prices FAIL
    the law loudly (chi2 far above the 15.51 critical value at 8 dof)."""
    from pinterest_data_pipeline400_spark.plans import relational_extra as rx

    out = rx.orders_benford_screen(spark, TEST_SF_DIR).toPandas()
    orders = rx._t(spark, TEST_SF_DIR, "orders")
    n = orders.count()
    assert list(out.digit) == list(range(1, 10))
    assert out.n_obs.sum() == n
    assert abs(out.expected_micro.sum() - n * 1_000_000) <= 9
    assert out.chi2_micro.iloc[0] == out.term_micro.sum()
    assert out.chi2_micro.iloc[0] > 15_507_000  # 15.507 * 1e6: screen fires


def test_customer_deciles_match_pandas_recompute(spark):
    """Independent recompute of the ranking-function entry: ntile's
    equi-depth rule (first n%10 buckets take the extra row),
    percent_rank = (rn-1)/(n-1), cume_dist = rn/n — rebuilt in pandas
    over the same total order and compared exactly."""
    from pinterest_data_pipeline400_spark.plans import relational_extra as rx

    out = rx.q_customer_value_deciles(spark, TEST_SF_DIR).toPandas()
    cust = rx._t(spark, TEST_SF_DIR, "customer").toPandas()
    for seg, grp in cust.groupby("c_mktsegment"):
        g = grp.sort_values(
            ["c_acctbal", "c_custkey"], ascending=[False, True]
        ).reset_index(drop=True)
        n = len(g)
        base, extra = n // 10, n % 10
        got = out[out.c_mktsegment == seg].set_index("c_custkey")
        for rn, row in enumerate(g.itertuples(), start=1):
            if extra:
                cut = extra * (base + 1)
                dec = (rn - 1) // (base + 1) + 1 if rn <= cut else \
                    extra + (rn - cut - 1) // base + 1
            else:
                dec = (rn - 1) // base + 1
            r = got.loc[row.c_custkey]
            assert int(r.decile) == dec, (seg, row.c_custkey)
            assert r.pct_rank == round((rn - 1) / (n - 1), 6)
            assert r.cume == round(rn / n, 6)
            assert int(r.acctbal_cents) == round(row.c_acctbal * 100)
