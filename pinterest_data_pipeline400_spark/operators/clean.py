"""The three cleaning pipelines (SURVEY.md §2.10: pin mount.py:96-174,
geo mount.py:178-199, user mount.py:203-223) as composable operators.

Semantics are reference-exact, with three conscious deviations recorded
in SURVEY.md §2.10 "quirks":

  * quirk 1 — streaming cannot run ``approxQuantile`` (an action), so the
    reference imputes the hardcoded constant 1000 there (kinesis.py:184-187)
    while batch imputes the exact dataset median (mount.py:127-131). Both
    modes are exposed via ``impute``.
  * quirk 5 — ``age`` stays a string in the reference's cleaned user
    table (numeric only via implicit cast at mount.py:314-317); here it
    is cast to int explicitly (try_cast semantics: junk → NULL).
  * the imputed median is cast back to int so cleaned ``follower_count``
    keeps the declared IntegerType (the reference's Python-float literal
    silently widened the column to double).

Performance notes for 100 TB:
  * Every step except ``dropDuplicates`` is a narrow, codegen-able
    projection — the whole pipeline is one WholeStageCodegen span because
    the follower_count parse is a native expression, not the reference's
    Python UDF (the UDF survives as the compat twin, property-tested
    equivalent in tests/test_clean_ops.py).
  * ``dropDuplicates()`` over the full row is the one shuffle; it hashes
    every column. At scale prefer ``dedup_keys=("ind", "unique_id")`` —
    same result on well-formed data, shuffles only the key columns.
  * ``median_follower_count`` (approxQuantile, relativeError 0.0) is an
    action — one extra pass over the data, exactly like the reference.
    At 100 TB run it per ingest batch with a bounded relativeError and
    cache the scalar; the exact mode exists for oracle parity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import GEO_CLEAN_COLUMNS, PIN_CLEAN_COLUMNS, USER_CLEAN_COLUMNS

#: Tokens the reference null-normalizes across all string columns (mount.py:99).
NULL_TOKENS = ["", "NA", "N/A"]

#: Streaming-mode imputation constant (kinesis.py:186).
STREAM_IMPUTE_CONSTANT = 1000

SAVE_LOCATION_PREFIX = "Local save in "


# --------------------------------------------------------------------------
# follower_count parsing — the reference's single UDF, implemented twice
# --------------------------------------------------------------------------

def convert_follower_count(count: str | None) -> int | None:
    """Compat parser, byte-for-byte semantics of mount.py:102-119 /
    kinesis.py:158-177: 'k' matched as a substring *anywhere* and checked
    *before* 'M'; float parse then int-truncate; any ValueError → None."""
    if count is None:
        return None
    # OverflowError: int(float('inf')) — 'Infinityk' parses as a float
    # the int() conversion cannot represent; the native twin yields
    # NULL there (try_cast overflow), so None keeps the pair aligned
    # instead of killing the task.
    if "k" in count:
        try:
            return int(float(count.replace("k", "")) * 1000)
        except (ValueError, OverflowError):
            return None
    if "M" in count:
        try:
            return int(float(count.replace("M", "")) * 1000000)
        except (ValueError, OverflowError):
            return None
    try:
        return int(count)
    except ValueError:
        return None


#: Row-at-a-time compat UDF (reference registration mount.py:121). Slow
#: path — exists only to property-test the native expression against.
#: (lambda wrapper: keeps pyspark from warning about un-inferable eval
#: type from the typed function's annotations)
convert_follower_count_udf = F.udf(lambda s: convert_follower_count(s), T.IntegerType())


def parse_follower_count(col: Column) -> Column:
    """Native-expression twin of :func:`convert_follower_count`.

    Catalyst codegens this (no Python worker round-trip — SURVEY.md §4
    calls the UDF the one codegen blocker). Equivalences relied on:

    * Python ``float(s)`` failure → None  ≡  ``try_cast(s as double)`` → NULL
    * Python ``int(float * 1000)`` truncates toward zero  ≡  ANSI
      ``try_cast(double as int)`` (fraction truncated, overflow → NULL —
      overflow is out of the reference grammar's range)
    * Python ``int(s)`` rejects decimals ("12.5" → ValueError)  ≡
      ``try_cast(s as int)`` → NULL in ANSI mode
    """
    k_val = (F.regexp_replace(col, "k", "").try_cast("double") * 1000).try_cast("int")
    m_val = (F.regexp_replace(col, "M", "").try_cast("double") * 1000000).try_cast("int")
    return (
        F.when(col.isNull(), F.lit(None).cast("int"))
        .when(col.contains("k"), k_val)
        .when(col.contains("M"), m_val)
        .otherwise(col.try_cast("int"))
    )


# --------------------------------------------------------------------------
# shared row-wise ops
# --------------------------------------------------------------------------

def normalize_nulls(df: DataFrame) -> DataFrame:
    """''/'NA'/'N/A' → NULL across all string columns (mount.py:99)."""
    return df.na.replace(NULL_TOKENS, None)


def fill_unknown(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """NULL → 'Unknown' for the given columns (mount.py:135-147)."""
    for c in cols:
        df = df.withColumn(c, F.coalesce(F.col(c), F.lit("Unknown")))
    return df


def normalize_media_type(df: DataFrame, col: str = "is_image_or_video") -> DataFrame:
    """'multi-video(story page format)' → 'video' (mount.py:151-154)."""
    return df.withColumn(
        col,
        F.when(F.col(col) == "multi-video(story page format)", "video").otherwise(F.col(col)),
    )


def strip_save_location(df: DataFrame, col: str = "save_location") -> DataFrame:
    """Strip the 'Local save in ' prefix (mount.py:164)."""
    return df.withColumn(col, F.regexp_replace(F.col(col), SAVE_LOCATION_PREFIX, ""))


# --------------------------------------------------------------------------
# the three pipelines
# --------------------------------------------------------------------------

def clean_pin(
    df: DataFrame,
    impute: str = "median",
    compat_udf: bool = False,
    dedup_keys: Sequence[str] | None = None,
) -> DataFrame:
    """pin cleaning pipeline, reference step order (mount.py:96-174):
    null-normalize → parse follower_count → impute → fill Unknowns →
    media normalize → dropDuplicates → cast+rename index→ind → strip
    save_location prefix → fixed column order.

    impute: "median" (batch semantics, mount.py:127-131 — triggers one
    approxQuantile action) or "constant" (streaming semantics,
    kinesis.py:184-187). compat_udf=True routes parsing through the
    Python UDF instead of the native expression (test/bench twin).
    """
    df = normalize_nulls(df)
    parser = convert_follower_count_udf(F.col("follower_count")) if compat_udf else parse_follower_count(F.col("follower_count"))
    df = df.withColumn("follower_count", parser)

    if impute == "median":
        # Mid-plan action, exactly like the reference: exact median of the
        # parsed values, re-embedded as a literal. approxQuantile returns
        # [] when every parsed value is NULL (empty batch, all-junk
        # column) — there is no median to impute, so the NULLs stand.
        q = df.approxQuantile("follower_count", [0.5], 0.0)
        fill = F.lit(int(q[0])).cast("int") if q else F.lit(None).cast("int")
    elif impute == "constant":
        fill = F.lit(STREAM_IMPUTE_CONSTANT).cast("int")
    else:
        raise ValueError(f"impute must be 'median' or 'constant', got {impute!r}")
    df = df.withColumn("follower_count", F.coalesce(F.col("follower_count"), fill))

    df = fill_unknown(df, ["is_image_or_video", "poster_name", "category"])
    df = normalize_media_type(df)
    df = df.dropDuplicates(list(dedup_keys) if dedup_keys else None)
    df = df.withColumn("index", F.col("index").cast(T.IntegerType())).withColumnRenamed("index", "ind")
    df = strip_save_location(df)
    return df.select(*PIN_CLEAN_COLUMNS)


def clean_geo(df: DataFrame, drop_nulls: bool = False) -> DataFrame:
    """geo cleaning pipeline (mount.py:178-199): coordinates =
    array(latitude, longitude) → drop lat/lon → cast timestamp →
    fixed column order.

    drop_nulls=True inserts the streaming path's full-row ``dropna()``
    at its reference position (kinesis.py:255) — i.e. AFTER the array
    build, so a null latitude does NOT drop the row (array() is never
    null); only null ind/country/timestamp do."""
    df = df.withColumn("coordinates", F.array(F.col("latitude"), F.col("longitude")))
    df = df.drop("latitude", "longitude")
    if drop_nulls:
        df = df.na.drop()
    df = df.withColumn("timestamp", F.col("timestamp").try_cast(T.TimestampType()))
    df = df.withColumn("ind", F.col("ind").cast(T.IntegerType()))
    return df.select(*GEO_CLEAN_COLUMNS)


def clean_user(df: DataFrame, drop_null_keys: bool = False) -> DataFrame:
    """user cleaning pipeline (mount.py:203-223): user_name =
    concat_ws(' ', first_name, last_name) → drop name parts → cast
    date_joined → fixed column order.

    age is explicitly try_cast to int (quirk 5). drop_null_keys=True adds
    the streaming path's dropna(subset=['ind','user_name'])
    (kinesis.py:285)."""
    df = df.withColumn("user_name", F.concat_ws(" ", F.col("first_name"), F.col("last_name")))
    df = df.drop("first_name", "last_name")
    df = df.withColumn("date_joined", F.col("date_joined").try_cast(T.TimestampType()))
    df = df.withColumn("age", F.col("age").try_cast(T.IntegerType()))
    df = df.withColumn("ind", F.col("ind").cast(T.IntegerType()))
    if drop_null_keys:
        # kinesis.py:285 dropna(subset=...) ≡ an isNotNull conjunction
        # (reference P10, kinesis.py:183) — expressed as a filter so the
        # predicate can reach the scan when the source is columnar
        df = df.filter(F.col("ind").isNotNull() & F.col("user_name").isNotNull())
    return df.select(*USER_CLEAN_COLUMNS)
