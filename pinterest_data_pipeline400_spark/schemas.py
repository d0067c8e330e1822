"""StructType schema constants — the single source of truth for both the
batch and streaming paths.

The reference declared explicit StructTypes only on the streaming side
(kinesis.py:75-81, 94-107, 118-124 — see SURVEY.md shorthand) and let the
batch JSON reader infer (mount.py:69-74), which is why ``follower_count``
arrived as a dirty string. The new engine uses these constants everywhere:
inference is a compat mode, never the default.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- raw event schemas (wire format of the three topics/streams) ----------

# pin: 12 columns (reference kinesis.py:94-107)
PIN_RAW = T.StructType(
    [
        T.StructField("index", T.IntegerType(), True),
        T.StructField("unique_id", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("poster_name", T.StringType(), True),
        # dirty by contract: "25k", "1.5M", "User Info Error", ...
        T.StructField("follower_count", T.StringType(), True),
        T.StructField("tag_list", T.StringType(), True),
        T.StructField("is_image_or_video", T.StringType(), True),
        T.StructField("image_src", T.StringType(), True),
        T.StructField("downloaded", T.IntegerType(), True),
        T.StructField("save_location", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
    ]
)

# geo: 5 columns (reference kinesis.py:75-81)
GEO_RAW = T.StructType(
    [
        T.StructField("ind", T.IntegerType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("latitude", T.DoubleType(), True),
        T.StructField("longitude", T.DoubleType(), True),
        T.StructField("country", T.StringType(), True),
    ]
)

# user: 5 columns (reference kinesis.py:118-124; note `age` is a string on
# the wire and only becomes numeric after cleaning — SURVEY.md §2.10 quirk 5)
USER_RAW = T.StructType(
    [
        T.StructField("ind", T.IntegerType(), True),
        T.StructField("first_name", T.StringType(), True),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("age", T.StringType(), True),
        T.StructField("date_joined", T.TimestampType(), True),
    ]
)

# --- cleaned schemas (what the queries consume) ----------------------------

PIN_CLEAN_COLUMNS = [
    "ind",
    "unique_id",
    "title",
    "description",
    "follower_count",
    "poster_name",
    "tag_list",
    "is_image_or_video",
    "image_src",
    "save_location",
    "category",
]  # column order fixed by the reference (mount.py:167-171)

GEO_CLEAN_COLUMNS = ["ind", "country", "coordinates", "timestamp"]  # mount.py:196
USER_CLEAN_COLUMNS = ["ind", "user_name", "age", "date_joined"]  # mount.py:220

PIN_CLEAN = T.StructType(
    [
        T.StructField("ind", T.IntegerType(), True),
        T.StructField("unique_id", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("follower_count", T.IntegerType(), True),
        T.StructField("poster_name", T.StringType(), True),
        T.StructField("tag_list", T.StringType(), True),
        T.StructField("is_image_or_video", T.StringType(), True),
        T.StructField("image_src", T.StringType(), True),
        T.StructField("save_location", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
    ]
)

GEO_CLEAN = T.StructType(
    [
        T.StructField("ind", T.IntegerType(), True),
        T.StructField("country", T.StringType(), True),
        T.StructField("coordinates", T.ArrayType(T.DoubleType()), True),
        T.StructField("timestamp", T.TimestampType(), True),
    ]
)

USER_CLEAN = T.StructType(
    [
        T.StructField("ind", T.IntegerType(), True),
        T.StructField("user_name", T.StringType(), True),
        T.StructField("age", T.IntegerType(), True),
        T.StructField("date_joined", T.TimestampType(), True),
    ]
)

# Driver-provided TPC-H-ish tables (TESTDATA.md); loaded by name.
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
