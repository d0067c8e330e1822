"""Unit + property tests for the cleaning operators (SURVEY.md §5 items
2-3): follower_count UDF ≡ native expression, pipeline edge cases, and
the geo array column the oracle entry can only check element-wise."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pinterest_data_pipeline400_spark.operators.clean import (
    clean_geo,
    clean_pin,
    clean_user,
    convert_follower_count,
    convert_follower_count_udf,
    parse_follower_count,
)

# Edge cases straight from the reference semantics (mount.py:102-119):
# 'k' matched as substring anywhere and before 'M'; float-then-truncate;
# ValueError -> None. Cases with BOTH k and M exercise the k-first rule.
EDGE_CASES = [
    None, "", "NA", "N/A", "25k", "1.5k", "2M", "1.5M", "10k5", "abc",
    "12.5", "0", "7k", "kM", "Mk", "1e3", "-5k", " 12", "99M", "k", "M",
    "1.2.3k", "User Info Error", "100", "0.5k", "000123", "12 ", "1.9",
    "724k", "3.3M", "-42",
]

# Grammar-restricted strategy: the dirty-data space the reference's data
# can contain. ASCII digits only — Python int()/float() additionally
# accept Unicode digits ('٠'), underscores ('1_0') and 'inf'/'nan',
# all outside the grammar; the native expression diverges there by
# design (see parse_follower_count docstring).
# Ranges bounded so parsed values stay inside int32: beyond it the
# reference's IntegerType UDF silently WRAPS (e.g. '10000M' ->
# 1410065408) while the native try_cast yields NULL — a conscious
# divergence asserted in test_parse_overflow_divergence.
FOLLOWER_STRINGS = st.one_of(
    st.from_regex(r"-?[0-9]{1,9}", fullmatch=True),
    st.from_regex(r"-?[0-9]{1,6}(\.[0-9]{1,2})?k", fullmatch=True),
    st.from_regex(r"-?[0-9]{1,3}(\.[0-9]{1,2})?M", fullmatch=True),
    st.from_regex(r"[0-9]{1,3}k[0-9]{0,3}", fullmatch=True),
    st.sampled_from(["", "NA", "N/A", "User Info Error", "abc", "k", "M", "kM"]),
    st.none(),
)


def _native_parse(spark, values: list[str | None]) -> list[int | None]:
    df = spark.createDataFrame([(v,) for v in values], "fc string")
    out = df.select(parse_follower_count(F.col("fc")).alias("p")).collect()
    return [r.p for r in out]


def test_parse_edge_cases_native_vs_python(spark):
    got = _native_parse(spark, EDGE_CASES)
    want = [convert_follower_count(v) for v in EDGE_CASES]
    assert got == want, list(zip(EDGE_CASES, got, want))


def test_parse_known_values(spark):
    cases = {"25k": 25000, "1.5M": 1500000, "842": 842, "1.5k": 1500,
             "User Info Error": None, "": None}
    got = dict(zip(cases, _native_parse(spark, list(cases))))
    assert got == cases


@settings(max_examples=8, deadline=None)
@given(st.lists(FOLLOWER_STRINGS, min_size=1, max_size=150))
def test_parse_property_equivalence(spark, values):
    """Property: native expression ≡ compat Python semantics over the
    whole dirty grammar (one Spark job per example batch)."""
    assert _native_parse(spark, values) == [convert_follower_count(v) for v in values]


def test_parse_overflow_divergence(spark):
    """Outside-int32 values: the reference UDF wraps (int32 cast of a
    Python long), the native expression gives NULL. NULL is the sane
    behavior; this test documents the divergence."""
    df = spark.createDataFrame([("10000M",), ("3000000000",)], "fc string")
    rows = df.select(
        convert_follower_count_udf("fc").alias("u"),
        parse_follower_count(F.col("fc")).alias("n"),
    ).collect()
    assert [r.n for r in rows] == [None, None]
    assert rows[0].u == 1410065408  # 10**10 wrapped into int32


def test_compat_udf_matches_native(spark):
    """The registered compat UDF (mount.py:121 twin) agrees with the
    native expression on the edge corpus."""
    df = spark.createDataFrame([(v,) for v in EDGE_CASES], "fc string")
    out = df.select(
        convert_follower_count_udf(F.col("fc")).alias("u"),
        parse_follower_count(F.col("fc")).alias("n"),
    ).collect()
    for r, v in zip(out, EDGE_CASES):
        assert r.u == r.n, v


def test_clean_pin_pipeline_semantics(spark):
    rows = [
        # (index, unique_id, title, desc, poster, fc, tags, media, src, dl, save, cat)
        (1, "u1", "t", "d", "Alice A", "10k", "a,b", "multi-video(story page format)",
         "s1", 0, "Local save in /data/art", "art"),
        (1, "u1", "t", "d", "Alice A", "10k", "a,b", "multi-video(story page format)",
         "s1", 0, "Local save in /data/art", "art"),  # exact dup -> dropped
        (2, "u2", "NA", "", "N/A", "User Info Error", "c", "image",
         "s2", 1, "Local save in /data/diy", "N/A"),
        (3, "u3", "x", "y", "Bob B", "7", "d", "video",
         "s3", 0, "Local save in /data/x", "cats"),
    ]
    cols = ["index", "unique_id", "title", "description", "poster_name",
            "follower_count", "tag_list", "is_image_or_video", "image_src",
            "downloaded", "save_location", "category"]
    df = spark.createDataFrame(rows, cols)
    out = {r.ind: r for r in clean_pin(df).collect()}
    assert len(out) == 3  # dup removed
    assert out[1].is_image_or_video == "video"  # media normalized
    assert out[1].follower_count == 10000
    assert out[1].save_location == "/data/art"  # prefix stripped
    # dirty tokens -> None -> Unknown fills; junk fc -> median of {10000,
    # 10000, 7} = 10000 imputed (pre-dedup median per mount.py:127-131)
    assert out[2].title is None
    assert out[2].poster_name == "Unknown"
    assert out[2].category == "Unknown"
    assert out[2].follower_count == 10000
    assert out[3].follower_count == 7


def test_clean_pin_constant_impute(spark):
    rows = [(1, "u1", "t", "d", "P", "junk", "a", "image", "s", 0,
             "Local save in /data/a", "art")]
    cols = ["index", "unique_id", "title", "description", "poster_name",
            "follower_count", "tag_list", "is_image_or_video", "image_src",
            "downloaded", "save_location", "category"]
    out = clean_pin(spark.createDataFrame(rows, cols), impute="constant").collect()
    assert out[0].follower_count == 1000  # kinesis.py:186 constant


def test_clean_geo_builds_array(spark):
    df = spark.createDataFrame(
        [(1, "2021-01-02 03:04:05", 10.5, -20.25, "France")],
        "ind int, timestamp string, latitude double, longitude double, country string",
    )
    row = clean_geo(df).collect()[0]
    assert row.coordinates == [10.5, -20.25]  # array(lat, lon), mount.py:187
    assert row.timestamp == pd.Timestamp("2021-01-02 03:04:05")
    assert clean_geo(df).columns == ["ind", "country", "coordinates", "timestamp"]


def test_clean_user_semantics(spark):
    df = spark.createDataFrame(
        [(1, "Ada", "Lovelace", "28", "2020-05-05 00:00:00"),
         (2, "Bad", "Age", "NA", "2019-01-01 00:00:00")],
        "ind int, first_name string, last_name string, age string, date_joined string",
    )
    rows = {r.ind: r for r in clean_user(df).collect()}
    assert rows[1].user_name == "Ada Lovelace"
    assert rows[1].age == 28
    assert rows[2].age is None  # junk age -> NULL (explicit try_cast, quirk 5)
    assert clean_user(df).columns == ["ind", "user_name", "age", "date_joined"]


def test_clean_pin_plan_has_no_python_udf(spark):
    """The hot path must stay in codegen: the native parse means no
    BatchEvalPython / ArrowEvalPython node in the plan (SURVEY.md §4)."""
    from pinterest_data_pipeline400_spark.generator import ensure_fixtures
    fx = ensure_fixtures("sf0.001")
    df = spark.read.parquet(f"{fx}/pin_raw.parquet")
    plan = clean_pin(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "PythonUDF" not in plan


def test_cleaned_tables_cache_isolated_per_session(spark):
    """The clean-once cache must live on the session OBJECT, not in a
    module dict keyed by id(spark): two sessions may never share
    checkpointed DataFrames, and a dead session's cache must die with
    it (so a recycled object id can't resurrect another session's
    tables — VERDICT r3 nit #1)."""
    from pinterest_data_pipeline400_spark.plans import pinterest_queries as pq

    sf_dir = "/root/testdata/sf0.001"
    t1 = pq.cleaned_tables(spark, sf_dir)
    sibling = spark.newSession()
    t2 = pq.cleaned_tables(sibling, sf_dir)
    # Distinct sessions get distinct cleaned DataFrames...
    assert t1["pin"] is not t2["pin"]
    # ...and identical results (same fixture, same pipeline).
    assert t1["pin"].count() == t2["pin"].count()
    # Same session + fixture returns the cached object (clean once).
    assert pq.cleaned_tables(spark, sf_dir)["pin"] is t1["pin"]
    # Cache storage is per-session state, not module-global state.
    assert getattr(sibling, pq._CACHE_ATTR) is not getattr(spark, pq._CACHE_ATTR)


def test_gini_matches_numpy_recompute(spark):
    """Independent numpy recompute of the spend Gini (rank formula
    over ascending integer cents) plus invariants: G in [0, 1) on a
    positive-spend population, and G = 0 on a degenerate equal-spend
    frame recomputed by hand."""
    import numpy as np
    import pandas as pd

    from pinterest_data_pipeline400_spark.plans import relational_extra as rx
    from tests.conftest import TEST_SF_DIR

    orders = pd.read_parquet(f"{TEST_SF_DIR}/orders.parquet")
    cents = (
        orders.assign(c=(orders.o_totalprice * 100).round().astype("int64"))
        .groupby("o_custkey")["c"]
        .sum()
        .sort_values(kind="stable")
    )
    x = cents.to_numpy()
    nn = len(x)
    i = np.arange(1, nn + 1, dtype="int64")
    want = round(2 * float((i * x).sum()) / (nn * float(x.sum())) - (nn + 1) / nn, 6)

    out = rx.orders_gini_spend(spark, TEST_SF_DIR).toPandas().iloc[0]
    assert int(out.n_customers) == nn
    assert int(out.total_cents) == int(x.sum())
    assert abs(float(out.gini) - want) < 1e-9
    assert 0.0 <= float(out.gini) < 1.0


def test_gini_binned_equals_exact_and_partitions_window(spark):
    """The binned-Lorenz twin is EXACT, not an approximation: the bin
    function is monotone in cents and cents ties share a bin, so
    rank = offset(bin) + local_rank reassembles the global rank sum
    identically — pinned by full-row equality against the exact
    entry. Scale contract: the customer-grain row_number runs under a
    PARTITIONED window spec (never the exact entry's single-task
    global sort); the only unpartitioned window consumes the <= 4096
    per-bin aggregate rows."""
    from pinterest_data_pipeline400_spark.plans import relational_extra as rx
    from tests.conftest import TEST_SF_DIR

    exact = rx.orders_gini_spend(spark, TEST_SF_DIR).toPandas().iloc[0]
    binned_df = rx.orders_gini_spend_binned(spark, TEST_SF_DIR)
    binned = binned_df.toPandas().iloc[0]
    assert int(binned.n_customers) == int(exact.n_customers)
    assert int(binned.total_cents) == int(exact.total_cents)
    assert float(binned.gini) == float(exact.gini)

    plan = binned_df._jdf.queryExecution().executedPlan().toString()
    # AQE prints Final + Initial sections; assert on the final plan only
    plan = plan.split("== Initial Plan ==")[0]
    # row_number (customer grain) must carry a partition spec; the
    # unpartitioned cumulative-offset window carries only the sum.
    for line in plan.splitlines():
        if "row_number()" in line:
            assert "windowspecdefinition(bin" in line, line
    assert "CartesianProduct" not in plan
    # the only BNLJ is the broadcast one-row max(cents) stats join —
    # the repo's standard global-stat idiom, bounded by construction
    assert plan.count("BroadcastNestedLoopJoin") <= 1
