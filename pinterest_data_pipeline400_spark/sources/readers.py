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


#: The exact column set + types the Spark Kafka source returns
#: (spark-sql-kafka's fixed output schema). Anything downstream of
#: ``read_kafka`` is written against THIS shape, so a crafted DataFrame
#: with this schema exercises the full decode contract without a broker.
KAFKA_WIRE = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)


def envelope_to_kafka_records(
    raw: DataFrame, topic: str, num_partitions: int = 3, streaming: bool = False
) -> DataFrame:
    """Reshape envelope rows (StreamName/PartitionKey/Data) into the
    EXACT DataFrame shape the Spark Kafka source emits (``KAFKA_WIRE``):
    UTF-8 bytes in binary key/value, topic/partition/offset/timestamp
    metadata. This is the broker-less stand-in for ``read_kafka`` —
    the reference's REST-proxy emulator put the record JSON in the
    Kafka message value keyed by the partition key
    (user_posting_emulation.py analog), which is what the value/key
    mapping reproduces. partition = hash(key) % N mirrors the default
    Kafka partitioner; offset/timestamp are synthetic metadata that no
    decode step reads (a fixed literal timestamp keeps the frame
    deterministic). Pass ``streaming=True`` when ``raw`` is a
    streaming DataFrame: monotonically_increasing_id is not allowed
    on streams, so the synthetic offset becomes a content hash
    (equally unread downstream)."""
    from pyspark.sql import functions as F

    offset = (
        F.xxhash64("Data") if streaming else F.monotonically_increasing_id()
    )
    shaped = raw.select(
        F.encode(F.col("PartitionKey"), "UTF-8").alias("key"),
        F.encode(F.col("Data"), "UTF-8").alias("value"),
        F.lit(topic).alias("topic"),
        F.pmod(F.xxhash64("PartitionKey"), F.lit(num_partitions))
        .cast("int")
        .alias("partition"),
        offset.alias("offset"),
        F.lit("2021-01-01 00:00:00").cast("timestamp").alias("timestamp"),
        F.lit(0).alias("timestampType"),
    )
    # Literal metadata columns come out non-nullable where the Kafka
    # source declares nullable — tighter nullability is a valid
    # instance of the wire contract (downstream code written against
    # nullable fields accepts non-null values), so no widening cast.
    return shaped


def kafka_value_as_envelope(records: DataFrame) -> DataFrame:
    """The one-line adapter between the Kafka wire shape and the
    envelope decode path: ``CAST(value AS STRING) AS Data`` — after
    this, ``streaming.decode_stream`` (CAST → from_json → flatten) runs
    unchanged on Kafka records, so the MSK-analog decode contract and
    the file-stream analog share one implementation."""
    return records.selectExpr("CAST(value AS STRING) AS Data")


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
