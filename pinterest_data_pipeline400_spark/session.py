"""SparkSession builder with engine defaults.

The reference ran on Databricks and configured nothing explicitly (its
Spark conf was the platform's). The new engine pins the settings that
matter for both local correctness-testing and 1000-executor scale:

  * AQE on (runtime coalescing, skew-join splitting, dynamic join
    strategy switch) — the single biggest win at 100 TB where static
    statistics lie.
  * ``spark.sql.shuffle.partitions`` sized to the local core count; on a
    real cluster this is overridden to ~2-3x total cores (and AQE
    coalesces down).
  * Session time zone pinned to UTC so timestamp semantics are identical
    to the DuckDB oracle and independent of the host.
  * Arrow enabled for any pandas exchange (the slow-path UDFs).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def build_session(
    app_name: str = "pinterest_data_pipeline400_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession with scale-aware defaults."""
    n = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # local-mode heap: the driver JVM IS the executor, so this is
        # the whole memory budget on the 128 GiB local[32] rig. 8g held
        # through round 9, but the sf1 full sweep runs the DOCUMENTED
        # degenerate posting-join baselines (docs_dup_containment:
        # 402M candidate rows) in a JVM already carrying ~280 entries
        # of accumulated block-manager state, and one r10 run OOM'd a
        # task there, killing the context and erroring every later
        # entry. 16g restores the headroom; a real cluster sizes
        # executors independently (see PERF.md "100 TB configuration
        # deltas"). Since r12 the posting baselines are OUT of the
        # default bench lane (SPARK_GRAFT_BASELINE_LANE=1 opts in), so
        # the default sweep no longer approaches this ceiling — 16g is
        # kept for the opt-in lane and ad-hoc sessions.
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g")
        )
        .config("spark.ui.enabled", "false")
        # keep managed-table data and the embedded-Derby log out of the
        # process cwd (a caller-built session without these just writes
        # ./spark-warehouse + ./derby.log — harmless, but untidy)
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        .config(
            "spark.driver.extraJavaOptions", "-Dderby.system.home=/tmp/spark_graft_jdbc"
        )
        # Parquet pushdown is on by default; pin it so a conf drift can't
        # silently disable the scan-level filters the plans rely on.
        .config("spark.sql.parquet.filterPushdown", "true")
        # Local fixtures are single ~10-30 MB parquet files; the 128 MB
        # default would scan them in ONE task and serialize every
        # expression-heavy projection (md5 minhashing, parsing). 16 MB
        # mimics the multi-split parallelism a real cluster gets from
        # many files. On a production cluster leave this at default.
        .config("spark.sql.files.maxPartitionBytes", "16m")
        # NOTE on parquet TIMESTAMP(NANOS) (the driver's events.parquet):
        # Spark 4.x loads it as TIMESTAMP_NTZ truncated to micros (the
        # 3.x nanosAsLong escape hatch was removed and is silently
        # ignored if set). The engine normalizes the column per-dtype in
        # events_queries._with_event_ts rather than via session conf.
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


#: Runtime-settable SQL confs every query depends on for correctness —
#: applied defensively per query call because the DRIVER may hand us a
#: session it built itself (entry()/queries() contract), without this
#: module's builder defaults:
#:   * UTC session time zone: timestamp wall-clocks must match the
#:     DuckDB oracle regardless of host TZ (and makes the
#:     TIMESTAMP_NTZ→timestamp cast in events_queries lossless);
#:   * parquet filter pushdown pinned on (scan-level filters).
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
}


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Apply the correctness-critical runtime confs to ANY session."""
    for k, v in RUNTIME_CONFS.items():
        spark.conf.set(k, v)
    # A foreign session usually carries the 200-partition default; size
    # shuffles (and, more importantly, streaming state stores, which pin
    # their partition count at first checkpoint) to the actual core
    # count. AQE coalesces batch shuffles anyway; state stores don't.
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(spark.sparkContext.defaultParallelism)
    )


#: Partition count for streaming STATE stores on this single-JVM test
#: rig. Batch shuffles want one partition per core (AQE coalesces), but
#: every state partition of a streaming query carries fixed per-micro-
#: batch overhead — a state-store commit, checkpoint delta files, and
#: (for applyInPandasWithState) a dedicated Python worker with a state
#: server. At local fixture scale that overhead dominates: measured on
#: the stateful-counts entry, 32 state partitions cost 3-8x the wall
#: clock of 8, and degrade further when the listener/maintenance queues
#: are busy after heavy batch queries. On a real cluster, size this to
#: keyspace x executors via the env var instead.
STREAM_STATE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")
)

#: Bound on ``awaitTermination`` for availableNow drains. Fixture-scale
#: file streams finish in seconds; a bounded fallback keeps one wedged
#: query from eating an entire harness budget (round 2 lost 32 entries
#: to exactly that). Override via env for genuinely large replays.
STREAM_DRAIN_TIMEOUT_SEC = int(os.environ.get("SPARK_GRAFT_STREAM_TIMEOUT", "60"))

#: One scratch root for every module that materializes derived
#: on-disk layouts (format round trips, partitioned/z-ordered
#: copies, per-file media trees). A single definition: changing it
#: (e.g. to honor TMPDIR) cannot leave another module writing to
#: the old location.
SCRATCH_ROOT = os.environ.get("SPARK_GRAFT_SCRATCH", "/tmp/spark_graft_formats")

#: Grace age before a prior-generation derived-cache dir is pruned. A
#: concurrent session pinned to the previous fixture stamp may still be
#: mid-scan on the old tree; deleting it under that reader turns a disk
#: leak into a cross-session query failure (ADVICE r5). Regeneration
#: already makes the old stamp unreachable for NEW readers, so pruning
#: can safely wait out in-flight ones.
PRUNE_GRACE_SEC = int(os.environ.get("SPARK_GRAFT_PRUNE_GRACE_SEC", "600"))


def mark_generation_used(path: str) -> None:
    """Record "a reader just opened this generation" by bumping the
    dir's mtime. :func:`prune_stale_siblings` ages generations by
    mtime; without this touch a long scan over a generation *written*
    longer than :data:`PRUNE_GRACE_SEC` ago could have the tree pruned
    underneath it by a concurrent rebuild (ADVICE r6 — write time is
    not last-use time). Callers touch at reader open; best-effort."""
    try:
        os.utime(path, None)
    except OSError:
        pass


def prune_stale_siblings(pattern: str, keep: str) -> None:
    """Delete content-stamped sibling cache dirs matching the glob
    ``pattern``, except ``keep`` (the generation being built) and
    except generations used within :data:`PRUNE_GRACE_SEC` — the one
    shared implementation of the prior-generation cleanup every
    derived-layout builder (format round trips, media trees, bucketed
    tables, z-ordered copies) previously hand-rolled with an immediate,
    reader-unsafe ``rmtree``. "Used" = dir mtime, which readers bump
    via :func:`mark_generation_used` at open, so the grace window
    measures from last read, not last write."""
    import glob as _glob
    import shutil as _sh
    import time as _time

    now = _time.time()
    for stale in _glob.glob(pattern):
        if stale == keep:
            continue
        try:
            age = now - os.path.getmtime(stale)
        except OSError:
            continue  # vanished concurrently — nothing to prune
        if age > PRUNE_GRACE_SEC:
            _sh.rmtree(stale, ignore_errors=True)


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int):
    """Temporarily set ``spark.sql.shuffle.partitions`` (restored on
    exit). Streaming queries pin their state-store partition count from
    this conf at FIRST checkpoint creation — so wrap the
    ``writeStream.start()`` (and everything up to ``awaitTermination``)
    for queries with fresh checkpoints; batch plans built outside the
    scope are unaffected."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def get_session() -> SparkSession:
    """Return the active session, building one with defaults if absent."""
    active = SparkSession.getActiveSession()
    return active if active is not None else build_session()
