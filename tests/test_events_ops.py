"""Contract tests for the as-of and range joins beyond oracle parity:
an independent pandas recomputation of the semantics, and the physical
plans that make them scale (equi/window plans, never a nested loop)."""

from __future__ import annotations

import pandas as pd

from pinterest_data_pipeline400_spark.plans import events_queries as eq
from tests.conftest import TEST_SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _events_pdf(spark) -> pd.DataFrame:
    return eq._events(spark, TEST_SF_DIR).toPandas()


def test_asof_join_matches_pandas_merge_asof(spark):
    ev = _events_pdf(spark)
    lefts = ev[ev.event_type == eq.ASOF_LEFT_TYPE].sort_values("ts")
    rights = (
        ev[ev.event_type == eq.ASOF_RIGHT_TYPE]
        .sort_values(["ts", "event_id"])
        .groupby(["user_id", "ts"], as_index=False)
        .last()  # max event_id per (user, ts) — the dedup rule
        .sort_values("ts")
    )
    expected = pd.merge_asof(
        lefts,
        rights[["user_id", "ts", "event_id"]].rename(
            columns={"event_id": "click_event_id"}
        ),
        on="ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
    )
    out = eq.ev_asof_join(spark, TEST_SF_DIR).toPandas()
    m = expected.merge(out, on="event_id", suffixes=("_exp", ""))
    assert len(m) == len(lefts)
    exp = m.click_event_id_exp.astype("Float64")
    got = m.click_event_id.astype("Float64")
    assert (exp.isna() == got.isna()).all()
    assert (exp.dropna() == got.dropna()).all()


def test_asof_join_is_single_user_shuffle(spark):
    """The scale contract: one window over user_id — no join operator of
    any kind in the plan (the as-of is computed by the union+window)."""
    plan = _plan(eq.ev_asof_join(spark, TEST_SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_range_join_matches_naive_recompute(spark):
    ev = _events_pdf(spark)
    lefts = ev[ev.event_type == eq.ASOF_LEFT_TYPE]
    out = eq.ev_range_join(spark, TEST_SF_DIR).toPandas().set_index("event_id")
    assert len(out) == len(lefts)
    for _, l in lefts.iterrows():
        lo = l.ts - pd.Timedelta(seconds=eq.RANGE_WINDOW_SEC)
        prior = ev[(ev.user_id == l.user_id) & (ev.ts >= lo) & (ev.ts < l.ts)]
        assert out.loc[l.event_id, "n_prior"] == len(prior)
        assert out.loc[l.event_id, "prior_value_cents"] == int(
            round(prior.value * 100).sum()
        )
    assert (out.n_prior == 0).any() and (out.n_prior > 0).any()


def test_range_join_is_bucketed_equi_join(spark):
    """The inequality never reaches the join operator: candidates come
    from a hash join on (user, bucket)."""
    plan = _plan(eq.ev_range_join(spark, TEST_SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_approx_distinct_within_rsd_of_exact(spark):
    """The HLL++ scale path must track the exact oracle path: per
    event_type, |approx - exact| / exact well inside a few rsd."""
    from pinterest_data_pipeline400_spark.operators.analytics import (
        distinct_count_expr,
    )
    from pinterest_data_pipeline400_spark.plans.events_queries import _events

    ev = _events(spark, TEST_SF_DIR)
    both = (
        ev.groupBy("event_type")
        .agg(
            distinct_count_expr("user_id", exact=True).alias("exact"),
            distinct_count_expr("user_id", exact=False, rsd=0.01).alias("approx"),
        )
        .collect()
    )
    assert both, "events fixture is empty"
    for r in both:
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.05, r


def test_events_ts_ingestion_canary(spark):
    """Version-drift canary: Spark has changed how it loads parquet
    TIMESTAMP(NANOS) across major versions (3.x: int64 via nanosAsLong;
    4.x: TIMESTAMP_NTZ truncated to micros — the conf is ignored). Pin
    the contract of ``_events`` — a TimestampType column whose instants
    equal what DuckDB reads natively — so the next upgrade drift fails
    HERE instead of in 13 ev_* entries."""
    import duckdb
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    ev = eq._events(spark, TEST_SF_DIR)
    assert isinstance(ev.schema["ts"].dataType, T.TimestampType)
    got = ev.agg(
        F.unix_timestamp(F.min("ts")).alias("lo"),
        F.unix_timestamp(F.max("ts")).alias("hi"),
        F.count("ts").alias("n"),
    ).first()
    exp = duckdb.sql(
        "SELECT CAST(floor(epoch(min(ts))) AS BIGINT),"
        "       CAST(floor(epoch(max(ts))) AS BIGINT), count(ts)"
        f" FROM '{TEST_SF_DIR}/events.parquet'"
    ).fetchone()
    assert (got.lo, got.hi, got.n) == exp


def test_hll_rollup_estimation_mode_accuracy(spark):
    """Beyond the fixture's exact-coupon-mode regime: at cardinalities
    past ~0.75*2^lgK the sketch estimates — pin the union-of-sketches
    estimate within 2% of exact so the scale path's error model is
    tested, not just asserted in a docstring."""
    from pyspark.sql import functions as F

    n = 50_000  # >> 2^14 coupon capacity → genuine HLL estimation mode
    df = spark.range(n).select(
        (F.col("id") % 10).alias("g"), F.col("id").alias("user_id")
    )
    fine = df.groupBy("g", (F.col("user_id") % 7).alias("sub")).agg(
        F.hll_sketch_agg("user_id", F.lit(eq.HLL_LGK)).alias("sk")
    )
    est = (
        fine.groupBy("g")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .agg(F.sum("est"))
        .first()[0]
    )
    assert abs(est - n) / n < 0.02


def test_kll_rollup_scale_mode_accuracy(spark):
    """Beyond exact mode: at k=200 over 50k values the KLL sketch
    genuinely estimates — pin the merged-sketch median's RANK error
    inside the sketch's ~1.6% bound (x2 safety) so the scale path's
    error model is tested, not just asserted in a docstring."""
    from pyspark.sql import functions as F

    n = 50_000
    df = spark.range(n).select((F.col("id") % 7).alias("sub"),
                               (F.col("id") * 1.0).alias("v"))
    fine = df.groupBy("sub").agg(
        F.kll_sketch_agg_double("v", F.lit(eq._KLL_K_SCALE)).alias("sk")
    )
    med = (
        fine.groupBy()
        .agg(F.expr("kll_merge_agg_double(sk)").alias("m"))
        .select(F.kll_sketch_get_quantile_double(
            "m", F.array(F.lit(0.5))).alias("q"))
        .first()[0][0]
    )
    # values are 0..n-1 so value/n IS the normalized rank
    assert abs(med / n - 0.5) < 0.032


def test_theta_overlap_scale_mode_accuracy(spark, monkeypatch):
    """Theta set algebra in genuine estimation mode (lg 12 over 40k+
    distinct keys): union and intersection estimates within a few
    percent of exact, via the same entry code path the bench runs
    (SPARK_GRAFT_DISTINCT_MODE=approx)."""
    from pyspark.sql import functions as F

    monkeypatch.setenv("SPARK_GRAFT_DISTINCT_MODE", "approx")
    assert eq._theta_lg() == eq._THETA_LG_SCALE
    n, overlap = 40_000, 10_000
    a = spark.range(n).select(F.col("id").alias("k"))                 # 0..n-1
    b = spark.range(n - overlap, 2 * n - overlap).select(F.col("id").alias("k"))
    sk = (
        a.select(F.lit("a").alias("s"), "k")
        .unionByName(b.select(F.lit("b").alias("s"), "k"))
        .groupBy("s")
        .agg(F.expr(f"theta_sketch_agg(k, {eq._THETA_LG_SCALE})").alias("sk"))
    )
    row = sk.groupBy().agg(
        F.max(F.when(F.col("s") == "a", F.col("sk"))).alias("sa"),
        F.max(F.when(F.col("s") == "b", F.col("sk"))).alias("sb"),
    ).select(
        F.expr("theta_sketch_estimate(theta_union(sa, sb))").alias("u"),
        F.expr("theta_sketch_estimate(theta_intersection(sa, sb))").alias("i"),
    ).first()
    assert abs(row.u - (2 * n - overlap)) / (2 * n - overlap) < 0.05
    assert abs(row.i - overlap) / overlap < 0.10  # intersection error compounds


def test_stream_upsert_multi_batch_and_idempotent(spark):
    """The foreachBatch upsert entry must (a) genuinely run multiple
    micro-batches (maxFilesPerTrigger=1 over a 3-file input), (b) end
    with the exact batch aggregate, and (c) be idempotent: re-applying
    the final batch's dynamic partition overwrite must not change the
    table (the replay-safety the pattern exists for)."""
    import os

    out = eq.ev_stream_upsert_counts(spark, TEST_SF_DIR).toPandas()
    exact = (
        eq._events(spark, TEST_SF_DIR)
        .groupBy("event_type")
        .count()
        .toPandas()
        .set_index("event_type")["count"]
    )
    got = out.set_index("event_type")["n_events"]
    assert got.sort_index().tolist() == exact.sort_index().tolist()

    from pinterest_data_pipeline400_spark.session import SCRATCH_ROOT

    base = os.path.join(
        SCRATCH_ROOT, "stream", f"ev_upsert_{os.path.basename(TEST_SF_DIR)}"
    )
    offsets = [f for f in os.listdir(os.path.join(base, "ckpt", "offsets"))
               if not f.startswith(".")]
    assert len(offsets) >= 2, "expected multiple micro-batches"

    # replay: dynamic-overwrite the same final counts again → unchanged
    sink = os.path.join(base, "sink")
    final = spark.read.parquet(sink)
    (
        final.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(sink)
    )
    again = spark.read.parquet(sink).toPandas().set_index("event_type")["n_events"]
    assert again.sort_index().tolist() == exact.sort_index().tolist()


def test_gapfill_seq_equals_recursive(spark):
    """The sequence()-spine gap-fill (scale path) and the recursive-CTE
    gap-fill (SQL-standard showcase) are the same query: pin their
    results identical row-for-row."""
    rec = eq.ev_daily_gapfill(spark, TEST_SF_DIR).toPandas()
    seq = eq.ev_daily_gapfill_seq(spark, TEST_SF_DIR).toPandas()
    rec = rec.sort_values("day").reset_index(drop=True)
    seq = seq.sort_values("day").reset_index(drop=True)
    pd.testing.assert_frame_equal(rec, seq)


def test_top_users_sketch_mode_accuracy(spark, monkeypatch):
    """approx_top_k with a tracker larger than the (type,user) domain
    returns EXACT counts; item order may differ from the exact path
    only on count ties, so compare the per-type count multisets and
    require every non-tied item to match."""
    from pinterest_data_pipeline400_spark.plans import events_queries as eq

    # the exact baseline must really take the exact path — a bench-style
    # wrapper exporting approx mode would make this test vacuous
    monkeypatch.delenv("SPARK_GRAFT_TOPK_MODE", raising=False)
    exact = eq.ev_top_users_sketch(spark, TEST_SF_DIR).toPandas()
    monkeypatch.setenv("SPARK_GRAFT_TOPK_MODE", "approx")
    approx = eq.ev_top_users_sketch(spark, TEST_SF_DIR).toPandas()
    assert sorted(approx["event_type"].unique()) == sorted(
        exact["event_type"].unique()
    )
    for et, g in exact.groupby("event_type"):
        a = approx[approx["event_type"] == et]
        assert sorted(a["n_events"]) == sorted(g["n_events"]), et
        # items whose count is unique within the group must agree
        uniq = g[~g["n_events"].duplicated(keep=False)]
        assert set(zip(uniq["user_id"], uniq["n_events"])) <= set(
            zip(a["user_id"], a["n_events"])
        ), et


def test_user_streaks_matches_bruteforce(spark):
    """Gaps-and-islands vs a direct Python recompute over synthetic day
    sets covering the edge shapes: singleton, full run, run with gaps,
    duplicate events on one day, and a month boundary crossing."""
    import datetime as dt

    from pinterest_data_pipeline400_spark.plans import events_queries as eq

    day_sets = {
        1: [1, 2, 3, 10, 11, 30],         # two runs + singleton
        2: [5],                           # singleton only
        3: list(range(1, 29)),            # one unbroken run
        4: [27, 28, 29, 30, 31, 32, 33],  # crosses a month boundary
        5: [7, 7, 7, 8],                  # duplicate events same day
    }
    rows = []
    eid = 0
    for uid, days in day_sets.items():
        for d in days:
            eid += 1
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 1, 1) + dt.timedelta(days=d - 1, hours=eid % 24),
                    uid,
                    "click",
                    1.0,
                    "{}",
                )
            )
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    import pinterest_data_pipeline400_spark.plans.events_queries as mod

    # route _events to the synthetic frame for this call only
    orig = mod._events
    mod._events = lambda s, sf: df
    try:
        got = {
            r["user_id"]: (r["n_active_days"], r["n_streaks"], r["longest_streak"])
            for r in eq.ev_user_streaks(spark, "unused").collect()
        }
    finally:
        mod._events = orig

    for uid, days in day_sets.items():
        uniq = sorted(set(days))
        runs, cur = [], 1
        for a, b in zip(uniq, uniq[1:]):
            if b - a == 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        assert got[uid] == (len(uniq), len(runs), max(runs)), uid


def test_time_weighted_avg_constant_value_invariant(spark):
    """LOCF property: if every event in a (type, day) carries the same
    value, the time-weighted average equals that value regardless of
    event spacing — and the weights must tile the day exactly (sum =
    seconds from first event to midnight)."""
    import datetime as dt

    import pinterest_data_pipeline400_spark.plans.events_queries as mod

    rows = []
    # irregular spacing, constant value 7.25 -> twa must be 725.0
    for i, minute in enumerate([0, 1, 5, 59, 301, 1402]):
        rows.append(
            (
                i,
                dt.datetime(2024, 3, 10, 0, 0, 0) + dt.timedelta(minutes=minute),
                1,
                "click",
                7.25,
                "{}",
            )
        )
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    orig = mod._events
    mod._events = lambda s, sf: df
    try:
        out = mod.ev_time_weighted_avg(spark, "unused").collect()
    finally:
        mod._events = orig
    assert len(out) == 1
    r = out[0]
    assert r["twa_value_cents"] == 725.0
    assert r["n_events"] == 6
    assert r["total_weight_sec"] == 86400  # first event at midnight tiles the day


def test_bot_screen_n_events_is_true_event_count(spark):
    """ADVICE r7: the gap frame has ONE row per event (the first row's
    lag is NULL), so count(*) already equals the user's event count —
    the old `count(*) + 1` inflated n_events by one on both engines,
    shifting every rate and the >= 20-event gate. Cross-check against
    an independent per-user count of the raw events table."""
    ev = _events_pdf(spark)
    true_counts = ev.groupby("user_id").size()
    out = eq.ev_bot_screen(spark, TEST_SF_DIR).toPandas().set_index("user_id")
    assert len(out) > 0
    for uid, row in out.iterrows():
        assert row["n_events"] == true_counts[uid], (
            uid,
            row["n_events"],
            true_counts[uid],
        )


def test_pagerank_mass_conserved_and_converging(spark):
    """PageRank invariants: every round's micro scores sum to ~1e6
    (teleport + dangling redistribution conserve probability mass up
    to per-node rounding), and the iteration contracts (total
    round-over-round movement does not grow)."""
    out = eq.ev_pagerank(spark, TEST_SF_DIR).toPandas()
    n = len(out)
    assert n > 0
    for c in ("pr_micro_r1", "pr_micro_r2", "pr_micro_r3"):
        assert abs(out[c].sum() - eq.PR_SCALE) <= n, (c, out[c].sum())
    move12 = (out.pr_micro_r2 - out.pr_micro_r1).abs().sum()
    move23 = (out.pr_micro_r3 - out.pr_micro_r2).abs().sum()
    assert move23 <= move12, (move12, move23)


def test_pagerank_per_round_joins_are_broadcast(spark):
    """The power-iteration scale contract: the EDGE-relation joins
    (against the bounded score/out-weight tables) must be broadcast
    hash joins — a shuffle of the corpus-sized edge list every round
    is the plan shape that dies at 100 TB. The 1-row scalar
    cross-joins (dangling mass, node count) legitimately compile to
    BroadcastNestedLoopJoin-Cross with the single row built and
    broadcast (the HITS l1-normalization shape), so only an unkeyed
    CartesianProduct is banned outright. Asserted on the TRAINING
    builder — the registered entry serves the cached score table."""
    plan = _plan(eq._pagerank_train(spark, TEST_SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # every nested-loop join in the plan is a Cross with a broadcast
    # (1-row) build side, never an inner/outer fallback
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line, line


def test_pagerank_users_matches_numpy_recompute(spark):
    """Independent recompute of the USER-grain PageRank (the
    shared-bug-passes-oracle mitigation): edges, out-weights, dangling
    mass, and all three rounds rebuilt in pandas/python with the same
    rounding discipline (half-up via floor(x+0.5) — python round() is
    banker's, both engines round half away from zero), compared
    EXACTLY against the registered entry."""
    import math

    rnd = lambda x: math.floor(x + 0.5)  # noqa: E731 — positive half-away
    ev = _events_pdf(spark).sort_values(["event_type", "ts", "event_id"])
    ev["to_user"] = ev.groupby("event_type").user_id.shift(-1)
    e = ev[(ev.to_user.notna()) & (ev.to_user != ev.user_id)]
    edges = (
        e.groupby(["user_id", "to_user"]).size().reset_index(name="w")
    )
    edges["to_user"] = edges["to_user"].astype("int64")
    ow = edges.groupby("user_id").w.sum().to_dict()
    nodes = sorted(ev.user_id.unique())
    n = len(nodes)
    damp = float(eq.PR_DAMP)
    pr = {u: rnd(float(eq.PR_SCALE) / n) for u in nodes}
    expected = {}
    for t in (1, 2, 3):
        contrib: dict[int, int] = {}
        for fu, tu, w in edges.itertuples(index=False):
            c = rnd(float(pr[fu]) * w / ow[fu])
            contrib[tu] = contrib.get(tu, 0) + c
        dm = sum(pr[u] for u in nodes if u not in ow)
        pr = {
            u: rnd(
                ((1 - damp) * eq.PR_SCALE + damp * dm) / n
                + damp * contrib.get(u, 0)
            )
            for u in nodes
        }
        expected[f"pr_micro_r{t}"] = dict(pr)
    out = eq.ev_pagerank_users(spark, TEST_SF_DIR).toPandas()
    assert len(out) == n
    for col, exp in expected.items():
        got = dict(zip(out.user_id, out[col]))
        assert got == exp, col


def test_pagerank_users_plan_is_shuffle_not_cartesian(spark):
    """User-grain power-iteration scale contract: the score table is
    corpus-sized, so no broadcast HINT is placed on it (AQE may still
    promote at test sizes — that is the optimizer's call); what the
    plan must never contain is an unkeyed CartesianProduct, and every
    BroadcastNestedLoopJoin must be a Cross with a 1-row build side
    (the scalar dangling-mass / node-count frames)."""
    plan = _plan(eq._pagerank_users_train(spark, TEST_SF_DIR))
    assert "CartesianProduct" not in plan
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line, line


def test_ks_statistic_matches_scipy_style_recompute(spark):
    """Independent recompute of the two-sample KS statistic in pandas
    (max ECDF gap over the pooled support) must equal the exact
    integer-scaled statistic the entry reports."""
    ev = _events_pdf(spark)
    pu = ev.groupby("user_id").apply(
        lambda g: round((g.value * 100).round().sum()), include_groups=False
    )
    import hashlib

    def arm(uid):
        return int(hashlib.md5(f"{uid}:abtest".encode()).hexdigest()[:8], 16) % 2

    arms = pu.index.map(arm)
    ya = sorted(pu[arms == 0])
    yb = sorted(pu[arms == 1])
    support = sorted(set(ya) | set(yb))
    import bisect

    d_scaled = max(
        abs(
            bisect.bisect_right(ya, v) * len(yb)
            - bisect.bisect_right(yb, v) * len(ya)
        )
        for v in support
    )
    out = eq.ev_abtest_ks(spark, TEST_SF_DIR).toPandas().iloc[0]
    assert out.na == len(ya) and out.nb == len(yb)
    assert out.d_scaled == d_scaled, (out.d_scaled, d_scaled)


def test_bootstrap_ci_brackets_the_sample_mean(spark):
    """Poisson-bootstrap sanity: the replica count survives (no empty
    replica at this N), the CI is ordered, it brackets the full-sample
    mean, and the SE is positive — the invariants that hold for any
    resampling of a non-degenerate metric."""
    out = eq.ev_bootstrap_ci(spark, TEST_SF_DIR).toPandas().iloc[0]
    assert out.n_replicas == eq.BOOT_REPLICAS
    assert out.ci_lo_millicents < out.ci_hi_millicents
    assert out.ci_lo_millicents <= out.mean_millicents <= out.ci_hi_millicents
    assert out.se_millicents > 0


def test_markov_attribution_invariants(spark):
    """Removal-effect contracts: every channel's removal strictly lowers
    the chain's conversion probability (removal only redirects mass to
    NULL, so effects are positive), attribution shares sum to ~1e6, and
    the full-chain conversion probability is a probability."""
    out = eq.ev_markov_attribution(spark, TEST_SF_DIR).toPandas()
    assert len(out) > 0
    assert (out.p_full_micro.between(0, 1_000_000)).all()
    assert (out.p_removed_micro <= out.p_full_micro).all()
    assert (out.re_micro > 0).all()
    assert abs(out.attribution_micro.sum() - 1_000_000) <= len(out)


def test_dp_type_counts_match_python_recompute(spark):
    """Independent recompute of the geometric-mechanism release:
    hashlib md5 -> 52-bit int -> trailing-zero counts -> noise =
    tz1 - tz2, dp_count = max(0, n + noise) — compared exactly per
    type. Structural contracts: the noise is a pure function of the
    group KEY (same type -> same noise at every sf), and trailing
    zeros of a nonzero 52-bit uniform are Geometric(1/2) in 0..51,
    so |noise| <= 51 by construction."""
    import hashlib

    ev = _events_pdf(spark)
    out = eq.ev_dp_type_counts(spark, TEST_SF_DIR).toPandas()

    def tz52(seed: str, key: str) -> int:
        x = int(hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:13], 16)
        if x == 0:
            # (0 & -0) = 0 takes the CASE chain's FIRST arm (< 2 -> 0)
            # on both engines; probability 2^-52 per key
            return 0
        return (x & -x).bit_length() - 1

    counts = ev.groupby("event_type").size()
    assert set(out.event_type) == set(counts.index)
    for r in out.itertuples():
        n = int(counts[r.event_type])
        noise = tz52("dp1", r.event_type) - tz52("dp2", r.event_type)
        assert int(r.n_events) == n
        assert int(r.dp_noise) == noise, r.event_type
        assert int(r.dp_count) == max(0, n + noise)
        assert abs(int(r.dp_noise)) <= 51


def test_ldiversity_flags_are_truly_homogeneous(spark):
    """Every flagged QI group must genuinely have < L distinct sensitive
    bands (recomputed in pandas), and groups the audit does NOT flag
    must all be diverse — no false negatives on this corpus."""
    import numpy as np

    ev = _events_pdf(spark)
    cents = np.rint(ev.value.to_numpy(dtype=float) * 100).clip(min=1)
    ev = ev.assign(
        dow_iso=ev.ts.dt.weekday + 1,
        hod=ev.ts.dt.hour,
        band=np.floor(np.log2(cents)).astype(int),
    )
    truth = ev.groupby(["event_type", "dow_iso", "hod"]).band.nunique()
    out = eq.ev_ldiversity_audit(spark, TEST_SF_DIR).toPandas()
    flagged = set(zip(out.event_type, out.dow_iso, out.hod))
    for key, l in truth.items():
        if key in flagged:
            assert l < eq.LDIV_L, (key, l)
        else:
            assert l >= eq.LDIV_L, (key, l)


def test_holt_forecast_matches_python_recurrence(spark):
    """Independent Python recompute of the milli-quantized Holt
    recurrence over the same zero-filled daily series must reproduce
    every level/trend/fitted value exactly, and the forecast rows must
    extend the final state linearly."""
    ev = _events_pdf(spark)
    days = (ev.ts.astype("int64") // 10**9 // 86400).astype(int)
    counts = days.value_counts().sort_index()
    lo, hi = counts.index.min(), counts.index.max()
    series = [(d, int(counts.get(d, 0))) for d in range(lo, hi + 1)]
    a, b = float(eq.HOLT_ALPHA), float(eq.HOLT_BETA)

    def rnd(x):  # engines round half AWAY FROM ZERO; python round() is banker's
        import math

        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    want = []
    l = series[0][1] * 1000
    t = 0
    want.append((series[0][0], series[0][1], l, t, l))
    for d, y in series[1:]:
        f = l + t
        l_new = rnd(a * y * 1000 + (1 - a) * (l + t))
        t = rnd(b * (l_new - l) + (1 - b) * t)
        l = l_new
        want.append((d, y, l, t, f))
    out = eq.ev_holt_forecast(spark, TEST_SF_DIR).toPandas()
    obs = out[out.kind == "obs"]
    got = [
        (int(r.day_epoch), int(r.y), int(r.level_milli), int(r.trend_milli),
         int(r.fitted_milli))
        for r in obs.itertuples()
    ]
    assert got == want
    fc = out[out.kind == "forecast"].sort_values("day_epoch")
    assert len(fc) == eq.HOLT_HORIZON
    for h, r in enumerate(fc.itertuples(), start=1):
        assert r.day_epoch == hi + h
        assert r.fitted_milli == l + h * t
        assert pd.isna(r.y)


def test_holt_winters_matches_pandas_recurrence(spark):
    """Independent recompute of the Holt-Winters entry (the
    shared-bug-passes-oracle mitigation): hourly spine, seasonal-grid
    init, the full triple recurrence with lag-168 references, and the
    24-hour forecast rebuilt in plain python with half-away rounding,
    compared EXACTLY row by row."""
    import math

    rnd = lambda x: math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)  # noqa: E731
    ev = _events_pdf(spark)
    e = (ev.ts.astype("int64") // (3_600_000_000 * 1000)).to_numpy()
    import collections

    cnt = collections.Counter(e.tolist())
    lo, hi = min(cnt), max(cnt)
    es = list(range(lo, hi + 1))
    ys = [cnt.get(x, 0) for x in es]
    per = eq.HW_PERIOD
    sa, na = sum(ys), len(ys)
    sk: dict[int, int] = {}
    nk: dict[int, int] = {}
    for x, y in zip(es, ys):
        k = x % per
        sk[k] = sk.get(k, 0) + y
        nk[k] = nk.get(k, 0) + 1
    s0 = {k: rnd(sk[k] * 1000.0 / nk[k] - sa * 1000.0 / na) for k in sk}
    # the smoothing literals are DECIMAL on both engines (SQL `0.3` is
    # DECIMAL, not double), so the recurrence is EXACT rational
    # arithmetic — recompute with Fraction, not float
    from fractions import Fraction as Fr

    def rndf(x: Fr) -> int:
        half = Fr(1, 2)
        import math as _m

        return _m.floor(x + half) if x >= 0 else _m.ceil(x - half)

    a, b, g = (Fr(eq.HW_ALPHA), Fr(eq.HW_BETA), Fr(eq.HW_GAMMA))
    rows = []
    l = ys[0] * 1000 - s0[es[0] % per]
    tr = 0
    s_hist = [s0[es[0] % per]]
    rows.append((es[0], ys[0], l, tr, s_hist[0], ys[0] * 1000))
    for t in range(1, len(es)):
        sref = s_hist[t - per] if t >= per else s0[es[t] % per]
        f = l + tr + sref
        lnew = rndf(a * (ys[t] * 1000 - sref) + (1 - a) * (l + tr))
        bnew = rndf(b * (lnew - l) + (1 - b) * tr)
        snew = rndf(g * (ys[t] * 1000 - lnew) + (1 - g) * sref)
        rows.append((es[t], ys[t], lnew, bnew, snew, f))
        l, tr = lnew, bnew
        s_hist.append(snew)
    T = len(es) - 1
    fc = []
    for h in range(1, eq.HW_HORIZON + 1):
        sref = s_hist[T + h - per]
        fc.append((es[T] + h, None, l, tr, sref, l + h * tr + sref))

    out = eq.ev_holt_winters_forecast(spark, TEST_SF_DIR).toPandas()
    obs = out[out.kind == "obs"].sort_values("hour_epoch")
    assert len(obs) == len(rows)
    for got, exp in zip(obs.itertuples(), rows):
        assert (
            int(got.hour_epoch), int(got.y), int(got.level_milli),
            int(got.trend_milli), int(got.season_milli),
            int(got.fitted_milli),
        ) == exp
    fco = out[out.kind == "forecast"].sort_values("hour_epoch")
    assert len(fco) == len(fc)
    for got, exp in zip(fco.itertuples(), fc):
        assert (
            int(got.hour_epoch), int(got.level_milli), int(got.trend_milli),
            int(got.season_milli), int(got.fitted_milli),
        ) == (exp[0], exp[2], exp[3], exp[4], exp[5])
        assert got.y is None or (got.y != got.y)  # null y on forecast rows


def test_holt_winters_short_span_falls_back_to_s0(spark, tmp_path):
    """ADVICE r9 guard: on an observed span SHORTER than one seasonal
    period (168 h) the forecast's lag-168 history index goes
    non-positive — pre-guard, Spark silently indexed from the array
    END (wrong season) while the oracle's inner join dropped the row.
    Both engines must now fall back to the s0 seed grid at the
    forecast hour's hour-of-week key: run the entry AND its oracle on
    a 40-hour synthetic events table and compare exactly, then pin the
    forecast season values to an independently recomputed s0 grid."""
    import math

    import duckdb
    import numpy as np
    import pandas as pd

    from tests.conftest import assert_frames_match

    rnd = lambda x: math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)  # noqa: E731
    rng = np.random.default_rng(7)
    hours = 40
    base = 1_700_000_400_000_000  # micros, NOT hour-aligned
    rows = []
    for i in range(400):
        h = int(rng.integers(0, hours))
        rows.append(
            (
                i,
                pd.Timestamp(base + h * 3_600_000_000 + int(rng.integers(0, 3_600_000_000)), unit="us"),
                int(rng.integers(0, 50)),
                "view",
                float(rng.random()),
                "{}",
            )
        )
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pdf.ts.astype("datetime64[us]")  # Spark can't scan NANOS
    sf_dir = str(tmp_path / "sfshort")
    import os

    os.makedirs(sf_dir)
    pdf.to_parquet(os.path.join(sf_dir, "events.parquet"), index=False)

    out = eq.ev_holt_winters_forecast(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{os.path.join(sf_dir, 'events.parquet')}')"
    )
    oracle = con.execute(eq._hw_oracle_sql()).fetchdf()
    con.close()
    assert_frames_match(out, oracle, "hw_short_span")

    # fallback branch really taken: every forecast row exists (the old
    # oracle inner join dropped all 24) and its season equals the s0
    # grid at that hour-of-week, recomputed independently
    per = eq.HW_PERIOD
    e = (pdf.ts.astype("int64") // (3_600_000_000 * 1000)).to_numpy()
    import collections

    cnt = collections.Counter(e.tolist())
    lo, hi = min(cnt), max(cnt)
    es = list(range(lo, hi + 1))
    ys = [cnt.get(x, 0) for x in es]
    assert len(es) < per  # the short-span premise
    sa, na = sum(ys), len(ys)
    sk: dict[int, int] = {}
    nk: dict[int, int] = {}
    for x, y in zip(es, ys):
        k = x % per
        sk[k] = sk.get(k, 0) + y
        nk[k] = nk.get(k, 0) + 1
    s0 = {k: rnd(sk[k] * 1000.0 / nk[k] - sa * 1000.0 / na) for k in sk}
    fco = out[out.kind == "forecast"].sort_values("hour_epoch")
    assert len(fco) == eq.HW_HORIZON
    for h, r in enumerate(fco.itertuples(), start=1):
        k = (es[-1] + h) % per
        # unobserved hour-of-week keys seed at deviation 0
        assert int(r.season_milli) == s0.get(k, 0)


def test_triangle_counts_match_python_recompute(spark):
    """Independent recompute of the triangle/lcc entry with plain
    python sets: rebuild the undirected interaction graph from the
    same lead-per-type adjacency, count triangles per node by
    neighbor-set intersection over each edge, and compare every
    (degree, triangles, lcc) row exactly. Also pins the global
    transitivity entry against the same recompute."""
    from collections import defaultdict

    ev = _events_pdf(spark).sort_values(["event_type", "ts", "event_id"])
    edges = set()
    for _, grp in ev.groupby("event_type"):
        users = grp.user_id.tolist()
        for u, v in zip(users, users[1:]):
            if u != v:
                edges.add((min(u, v), max(u, v)))
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    tri = defaultdict(int)
    n_tri = 0
    for a, b in edges:  # each triangle counted once per its 3 edges
        common = nbrs[a] & nbrs[b]
        n_tri += len(common)
        for c in common:
            tri[c] += 1  # each triangle hits each member via 1 opposite edge
    n_tri //= 3
    out = eq.ev_triangle_counts(spark, TEST_SF_DIR).toPandas()
    assert len(out) == len(nbrs)
    for r in out.itertuples():
        d = len(nbrs[r.user_id])
        assert r.degree == d
        assert r.triangles == tri[r.user_id], (r.user_id, r.triangles, tri[r.user_id])
        want_lcc = round(2.0 * tri[r.user_id] / (d * (d - 1)), 6) if d >= 2 else 0.0
        assert abs(r.lcc - want_lcc) < 1e-9

    g = eq.ev_graph_transitivity(spark, TEST_SF_DIR).toPandas().iloc[0]
    assert int(g.n_nodes) == len(nbrs)
    assert int(g.n_edges) == len(edges)
    assert int(g.n_triangles) == n_tri
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in nbrs.values())
    assert int(g.n_wedges) == wedges
    want_t = round(3.0 * n_tri / wedges, 6) if wedges else 0.0
    assert abs(float(g.transitivity) - want_t) < 1e-9


def test_triangle_plan_is_oriented_hash_join(spark):
    """Scale contract: the wedge join and the closing-edge join are
    hash equi-joins — no cartesian, no broadcast nested loop, no
    Python — and the orientation bound makes the wedge stage
    sum C(outdeg, 2), not sum C(deg, 2)."""
    plan = _plan(eq.ev_triangle_counts(spark, TEST_SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "PythonUDF" not in plan and "MapInPandas" not in plan


def test_label_propagation_matches_python_recompute(spark):
    """Independent recompute of synchronous LPA with dicts/Counters:
    same graph, same (count desc, min label) tiebreak, all three
    rounds compared exactly."""
    from collections import Counter, defaultdict

    ev = _events_pdf(spark).sort_values(["event_type", "ts", "event_id"])
    edges = set()
    for _, grp in ev.groupby("event_type"):
        users = grp.user_id.tolist()
        for u, v in zip(users, users[1:]):
            if u != v:
                edges.add((min(u, v), max(u, v)))
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    lab = {n: n for n in nbrs}
    want_rounds = []
    for _ in range(3):
        new = {}
        for n, ns in nbrs.items():
            counts = Counter(lab[m] for m in ns)
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        lab = new
        want_rounds.append(dict(lab))

    out = eq.ev_label_propagation(spark, TEST_SF_DIR).toPandas()
    assert len(out) == len(nbrs)
    for r in out.itertuples():
        assert (r.label_r1, r.label_r2, r.label_r3) == (
            want_rounds[0][r.user_id],
            want_rounds[1][r.user_id],
            want_rounds[2][r.user_id],
        ), r.user_id


def _write_events_parquet(path, rows):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["event_id"] = pdf.event_id.astype("int64")
    pdf["user_id"] = pdf.user_id.astype("int64")
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), path
    )


def test_stream_left_join_watermark_boundary(spark, tmp_path):
    """Pins the eviction boundary the oracle encodes: with watermark
    delay 10 min and max event time 12:00 on both streams, the final
    global watermark is 11:50 — an unmatched purchase AT 11:50:00
    emits its null row (INCLUSIVE boundary), one at 11:55 is held for
    a future batch, and a matched purchase emits regardless."""
    import os
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 11, 49, 59), 100, "purchase", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 11, 50, 0), 101, "purchase", 1.0, "{}"),
        (3, datetime(2024, 1, 1, 11, 55, 0), 102, "purchase", 1.0, "{}"),
        (4, datetime(2024, 1, 1, 12, 0, 0), 103, "purchase", 1.0, "{}"),
        (5, datetime(2024, 1, 1, 12, 0, 0), 104, "click", 1.0, "{}"),
        (6, datetime(2024, 1, 1, 11, 59, 0), 103, "click", 1.0, "{}"),
    ]
    _write_events_parquet(os.path.join(tmp_path, "events.parquet"), rows)
    out = (
        eq.ev_stream_stream_left_join(spark, str(tmp_path))
        .toPandas()
        .sort_values("purchase_id")
    )
    got = {int(r.purchase_id): r.click_id for r in out.itertuples()}
    assert set(got) == {1, 2, 4}  # 3 held (above watermark), 4 matched
    assert pd.isna(got[1]) and pd.isna(got[2])
    assert int(got[4]) == 6


def test_stream_left_join_matches_batch_recompute(spark):
    """Independent pandas recompute of the drained left-outer result
    on the real fixture: batch left interval join, null rows kept only
    for purchases at or below min(max p_ts, max c_ts) - 10 min."""
    ev = _events_pdf(spark)
    p = ev[ev.event_type == "purchase"]
    c = ev[ev.event_type == "click"]
    wm = min(p.ts.max(), c.ts.max()) - pd.Timedelta(minutes=10)
    want = set()
    for r in p.itertuples():
        m = c[
            (c.user_id == r.user_id)
            & (c.ts >= r.ts - pd.Timedelta(seconds=600))
            & (c.ts < r.ts)
        ]
        if len(m):
            for cr in m.itertuples():
                want.add((r.event_id, cr.event_id))
        elif r.ts <= wm:
            want.add((r.event_id, None))
    out = eq.ev_stream_stream_left_join(spark, TEST_SF_DIR).toPandas()
    got = {
        (int(r.purchase_id), None if pd.isna(r.click_id) else int(r.click_id))
        for r in out.itertuples()
    }
    assert got == want


def test_wilson_ctr_matches_scipy_style_recompute(spark):
    """Independent recompute of the Wilson intervals in plain python
    floats (same z = 1.96): exact equality of every interval against
    the recompute, the bracketing contract 0 <= lo <= p_hat <= hi <= 1,
    and the score-interval property that distinguishes Wilson from
    Wald: the interval CENTER is the convex combination
    (p + z^2/2n) / (1 + z^2/n) of p_hat and 1/2, so it strictly
    shrinks toward 1/2 — an always-testable, non-tautological
    invariant (Wald's center is p_hat itself)."""
    import math

    ev = _events_pdf(spark)
    n = ev.user_id.nunique()
    out = eq.ev_wilson_ctr(spark, TEST_SF_DIR).toPandas()
    z = 1.96
    for r in out.itertuples():
        c = ev[ev.event_type == r.event_type].user_id.nunique()
        assert r.n_users == n and r.n_converted == c
        p = c / n
        zz_n = z * z / n
        half = z * math.sqrt(p * (1 - p) / n + zz_n / n / 4)
        lo = round((p + zz_n / 2 - half) / (1 + zz_n), 6)
        hi = round((p + zz_n / 2 + half) / (1 + zz_n), 6)
        assert abs(r.p_hat - round(p, 6)) < 1e-9
        assert abs(r.wilson_lo - lo) < 1e-9 and abs(r.wilson_hi - hi) < 1e-9
        assert 0.0 <= r.wilson_lo <= r.p_hat <= r.wilson_hi <= 1.0
        # the score-center shrinkage that distinguishes Wilson from
        # Wald: center = (p + zz_n/2) / (1 + zz_n) pulls toward 1/2
        # by exactly the factor 1/(1 + zz_n)
        mid = (p + zz_n / 2) / (1 + zz_n)
        assert abs(mid - 0.5) <= abs(p - 0.5) / (1 + zz_n) + 1e-12
