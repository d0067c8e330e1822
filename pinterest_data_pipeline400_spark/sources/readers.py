"""Batch sources (SURVEY.md §2.1 S1-S5).

The reference read JSON topic dumps with inferred schema
(mount.py:63-75) and Delta tables for credentials. The new engine reads:

  * Parquet (columnar at rest — the default; gets filter pushdown and
    column pruning physically, not just logically),
  * JSON topic directories with an *explicit* schema (S1 re-done right;
    inference available only as a compat flag),
  * JDBC (S5) behind a thin wrapper, stub-tested (no database in CI).

At 100 TB the parquet reader is the only scan on the hot path; keep data
partitioned by a high-cardinality-enough key (e.g. date) so partition
pruning kicks in, and never glob a fixed ``partition=0`` path the way the
reference did (mount.py:66) — that hard-coded away all scan parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..schemas import TESTDATA_TABLES


def read_parquet_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver-fixture table: ``{sf_dir}/{name}.parquet``."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the driver fixture tables as a dict of DataFrames.

    Replaces the reference's ``exec()``-based variable creation
    (mount.py:77-82) with a plain dict (SURVEY.md §2.10 quirk 3).
    """
    out: dict[str, DataFrame] = {}
    # `is None`, not truthiness: an explicitly empty selection means
    # load nothing, not load everything
    for name in TESTDATA_TABLES if names is None else names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out


def read_json_topic(
    spark: SparkSession,
    topic_dir: str,
    schema: T.StructType | None = None,
    infer_compat: bool = False,
) -> DataFrame:
    """Read a topic's JSON dump directory (reference S1, mount.py:63-75).

    The reference always inferred (``option("inferschema","true")``);
    here an explicit schema is required unless ``infer_compat=True``.
    Reads the whole topic tree (all partitions), not a hard-coded
    ``partition=0`` glob.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    elif not infer_compat:
        raise ValueError(
            "explicit schema required; pass infer_compat=True for the "
            "reference's inference behavior"
        )
    return reader.json(topic_dir)


def sample_rows(df: DataFrame, n: int = 1, seed: int = 100) -> DataFrame:
    """O3 analog: the emulators' random-offset row sampling
    (``SELECT * FROM t LIMIT {random_row}, 1``, batch_emul.py:109) as a
    seeded ``ORDER BY rand(seed) LIMIT n`` — deterministic given the
    seed, executed as TakeOrderedAndProject (no global sort
    materialization)."""
    from pyspark.sql import functions as F

    return df.orderBy(F.rand(seed)).limit(n)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC source (reference S5: SQLAlchemy against RDS MySQL,
    batch_emul.py:61,109). Thin wrapper so tests can monkeypatch;
    no driver jar ships with the engine."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Partitioned JDBC scan — the only JDBC shape that survives scale.
    An un-partitioned ``read_jdbc`` funnels the whole table through ONE
    task (the reference's SQLAlchemy reads were single-connection too,
    batch_emul.py:61); this form splits ``partition_column`` into
    ``num_partitions`` range predicates so executors read concurrently.
    Pick a roughly-uniform numeric key (a synthetic mod-hash column
    works when none exists) or the stride partitions skew."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def read_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    streaming: bool = False,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Kafka source, the mirror of ``sinks.write_kafka`` (the
    reference's MSK topics, user_posting_emulation.py → REST proxy →
    Kafka → S3). Batch (``spark.read``) by default; ``streaming=True``
    returns the ``readStream`` form that feeds ``streaming.decode_stream``
    (its `value` column is the same envelope the file-stream analog
    decodes). Plan-level wrapper — no broker ships in this environment,
    so tests monkeypatch the reader like S5; the option contract is the
    tested surface."""
    reader = (spark.readStream if streaming else spark.read).format("kafka")
    reader = (
        reader.option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()
