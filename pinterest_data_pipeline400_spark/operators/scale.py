"""Scale techniques as first-class operators: bucketed co-located
joins and salted skew joins.

These are the two levers SURVEY.md §4 calls out for the 100 TB target
beyond what AQE gives automatically:

  * **Bucketing** (`write_bucketed` + `bucketed_join_ready`): persist
    both join sides pre-hashed into the same number of buckets on the
    join key. Catalyst then plans the join WITHOUT a shuffle on either
    side (SortMergeJoin over co-located buckets) — at 100 TB that
    deletes the dominant cost of repeated fact⋈fact joins. Verified by
    a plan test asserting zero Exchange operators in the bucketed join.
  * **Salting** (`salted_join`): explicit skew mitigation for joins
    where one key dominates (the reference's Kinesis partition-key "1"
    hotspot is the canonical example — stream_emul.py:132). The hot
    side's keys are split into ``salt`` sub-keys; the small side is
    replicated ``salt`` times; the join runs on (key, salt) so the hot
    key's rows spread over ``salt`` tasks. AQE's skew-join splitting
    covers sort-merge cases adaptively; explicit salting remains the
    tool when the skew is known and extreme (or for aggregations,
    where AQE cannot split a single hot group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    fmt: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (+sorted) managed table. Both sides
    of a recurring join written this way (same cols, same bucket count)
    join shuffle-free."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    # the in-memory catalog forgets tables across sessions but their
    # warehouse directories persist; clear orphans or saveAsTable
    # refuses with LOCATION_ALREADY_EXISTS. Managed-table layout is
    # {warehouse}/{db}.db/{table} for qualified names, {warehouse}/
    # {table} for the default database; local file warehouses only —
    # a remote warehouse (s3://...) cannot hold cross-session orphans
    # from this single-JVM engine, so the cleanup skips it.
    wh_uri = urlparse(spark.conf.get("spark.sql.warehouse.dir"))
    if wh_uri.scheme in ("", "file"):
        parts = table_name.lower().split(".")
        rel = f"{parts[0]}.db/{parts[1]}" if len(parts) == 2 else parts[-1]
        shutil.rmtree(f"{wh_uri.path}/{rel}", ignore_errors=True)
    (
        df.write.format(fmt)
        .mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str],
    force_sort_merge: bool = False,
) -> DataFrame:
    """Join two same-bucketed tables; with matching bucket specs the
    sort-merge plan contains no Exchange (asserted in tests).

    ``force_sort_merge`` adds the MERGE hint — at fixture scale Catalyst
    would otherwise pick a broadcast join (whose BroadcastExchange hides
    the co-location win this operator exists to demonstrate); at real
    scale both sides exceed the broadcast threshold and SMJ is the
    natural choice with no hint."""
    left = spark.table(left_table)
    if force_sort_merge:
        left = left.hint("merge")  # hints attach to join INPUTS, not results
    return left.join(spark.table(right_table), on=on)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: spread each key of the (skewed) big
    side over ``salt`` sub-partitions and replicate the small side to
    match. Output equals ``big.join(small, on, how)`` exactly for the
    supported join types; the hot key's work runs on ``salt`` tasks
    instead of one.

    ``how`` is restricted to the types where salting preserves join
    semantics: inner and the big-side-preserving left family (left /
    left_semi / left_anti). Right and full outer are REJECTED — the
    replicated small side would surface up to ``salt`` null-extended
    copies of every unmatched small row, silently corrupting the
    result; for those, salt the other side or pre-aggregate.

    Use when one key's row count dwarfs the rest (power-law keys) and
    the small side is too big to broadcast outright but cheap to
    replicate ``salt``×.
    """
    allowed = {"inner", "left", "leftouter", "left_outer",
               "semi", "left_semi", "leftsemi",
               "anti", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "small side breaks right/full-outer semantics (each "
            "unmatched small row would appear up to `salt` times)"
        )
    # uniquified temp column: never clobber a caller's same-named column
    salt_col = "__salt"
    taken = set(big.columns) | set(small.columns)
    while salt_col in taken:
        salt_col += "_"
    big_salted = big.withColumn(salt_col, (F.rand(seed=0) * salt).cast("int"))
    salts = F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    small_replicated = small.withColumn(salt_col, salts)
    out = big_salted.join(small_replicated, on=[on, salt_col], how=how)
    return out.drop(salt_col)


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Small-files compaction — the table-maintenance operator every
    long-lived 100 TB dataset needs (streaming sinks and fine-grained
    partition writes accumulate files far below the efficient scan
    size; each file costs a task, a footer read, and NameNode/listing
    pressure). Rewrites ``src_dir`` into ``dst_dir`` as
    ``ceil(input_bytes / target_file_bytes)`` files and returns that
    file count.

    ``sort_within_by`` optionally sorts rows WITHIN each output file
    (sortWithinPartitions — no global shuffle): clustering by a
    frequently-filtered key tightens parquet row-group min/max stats,
    so later scans skip row groups the way partition pruning skips
    directories — the poor man's Z-order, at zero extra shuffle cost.

    Uses coalesce (narrow, no shuffle) when reducing file count — the
    normal compaction direction; repartition (one shuffle) only when
    the input has FEWER splits than the target, where coalesce cannot
    increase parallelism.
    """
    import math
    import os

    # in-place compaction would truncate the source before the lazy
    # scan materializes (mode=overwrite deletes dst first) — refuse
    src_real, dst_real = os.path.realpath(src_dir), os.path.realpath(dst_dir)
    if dst_real == src_real or src_real.startswith(dst_real + os.sep):
        raise ValueError(
            f"compact_parquet dst_dir {dst_dir!r} would overwrite its own "
            "source; compact into a fresh directory, then swap"
        )

    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src_dir)
        for f in files
        if not f.startswith(("_", "."))
    )
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_dir)
    n_in = df.rdd.getNumPartitions()
    out = df.coalesce(n_out) if n_out <= n_in else df.repartition(n_out)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    out.write.mode("overwrite").parquet(dst_dir)
    return n_out


def zorder_key(x: Column, y: Column, bits: int = 20) -> Column:
    """Morton (Z-order) key: bit-interleave two non-negative integer
    dimensions into one 2*bits-wide sort key. Sorting/range-
    partitioning by this key clusters data so that parquet file and
    row-group [min,max] stats are TIGHT IN BOTH dimensions at once —
    a range predicate on EITHER column (or a box on both) skips most
    of the table, which a linear sort can only deliver for its leading
    column. This is the multi-dimensional-clustering primitive behind
    Delta/Iceberg OPTIMIZE ZORDER, built purely from codegen'd integer
    bit ops (shift/and/or) — no UDF, no shuffle of its own.

    ``bits`` bounds the per-dimension domain (values are masked to
    ``bits`` low bits; 20 bits = 1M distinct — normalize wider domains
    to a rank/bucket first). 2*bits must stay < 63 for the signed-long
    key.
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    z: Column | None = None
    for i in range(bits):
        for col, off in ((x, 0), (y, 1)):
            bit = F.shiftrightunsigned(col.cast("long"), i).bitwiseAND(F.lit(1))
            term = F.shiftleft(bit, 2 * i + off)
            z = term if z is None else z.bitwiseOR(term)
    assert z is not None
    return z


def write_zordered(
    df: DataFrame,
    x: Column,
    y: Column,
    dst_dir: str,
    n_files: int,
    bits: int = 20,
) -> None:
    """Materialize ``df`` as ``n_files`` parquet files clustered by the
    Z-order key of (x, y): ONE range shuffle on the interleaved key
    (range partitioning samples the key distribution, so files come
    out balanced even when the dimensions are skewed), an in-partition
    sort to tighten row-group stats inside each file, and a plain
    parquet write. The key itself is not persisted — the layout IS the
    index; readers just scan with ordinary pushdown filters and let
    file/row-group stats skip.
    """
    z_col = "__z"
    while z_col in df.columns:  # never clobber a caller's column
        z_col += "_"
    keyed = df.withColumn(z_col, zorder_key(x, y, bits))
    (
        keyed.repartitionByRange(n_files, z_col)
        .sortWithinPartitions(z_col)
        .drop(z_col)
        .write.mode("overwrite")
        .parquet(dst_dir)
    )
