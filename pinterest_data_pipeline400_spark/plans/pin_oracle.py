"""Shared DuckDB-oracle helpers for the pinterest cleaning pipelines.

Registration-free by design: ``streaming_queries`` and
``source_queries`` build their oracle SQL from these CTEs at import
time, and importing THIS module must not register the 20+
``pinterest_queries`` entries as a side effect. The driver grades the
first 50 registry entries in registration order (COVERAGE.md), so a
plan module must only ever register its own entries — any helper shared
across plan modules lives here instead.

The CTEs reconstruct the cleaned pin/geo/user tables (reference
mount.py:96-223) in DuckDB SQL over the same fixture parquet the Spark
side reads, so the driver's value-hash compare covers cleaning, not
just the query on top.
"""

from __future__ import annotations

from ..generator import ensure_fixtures

# The driver's correctness gate runs at sf0.01; its oracle SQL is a
# static string, so it must point at the sf0.01 fixtures. Materialize
# them at import time (pure pandas, ~1.5s, idempotent) so the oracle
# side can never observe a missing file regardless of execution order.
ORACLE_FX = ensure_fixtures("sf0.01")

_PIN_STRING_COLS = [
    "unique_id", "title", "description", "poster_name", "follower_count",
    "tag_list", "is_image_or_video", "image_src", "save_location", "category",
]

#: Bare-numeral branch is regexp-guarded: DuckDB TRY_CAST('12.5' AS
#: INTEGER) ROUNDS to 13, while Spark ANSI try_cast and the reference's
#: Python int() both reject decimals (NULL/None). The guard pins the
#: oracle to integer-literal inputs only, so the three parsers agree on
#: any input, not just the fixture grammar.
_PARSE_FC = """CASE
      WHEN follower_count IS NULL THEN NULL
      WHEN contains(follower_count, 'k')
        THEN TRY_CAST(trunc(TRY_CAST(replace(follower_count, 'k', '') AS DOUBLE) * 1000) AS INTEGER)
      WHEN contains(follower_count, 'M')
        THEN TRY_CAST(trunc(TRY_CAST(replace(follower_count, 'M', '') AS DOUBLE) * 1000000) AS INTEGER)
      WHEN regexp_full_match(follower_count, '\\s*[+-]?[0-9]+\\s*')
        THEN TRY_CAST(follower_count AS INTEGER)
      ELSE NULL
    END"""


def _ctes(fx: str, pin_impute: str = "(SELECT m FROM pin_median)") -> str:
    """The WITH-clause body every pinterest oracle shares: null-normalize
    → parse → impute → fill/normalize → DISTINCT (full 12-col row,
    mirroring dropDuplicates-before-projection) for pin; row-wise cleans
    for geo/user. ``pin_impute`` defaults to the batch median
    (mount.py:127-131); the streaming oracles pass the constant 1000
    (kinesis.py:186)."""
    nn = ",\n        ".join(
        f"CASE WHEN {c} IN ('', 'NA', 'N/A') THEN NULL ELSE {c} END AS {c}"
        for c in _PIN_STRING_COLS
    )
    return f"""
    pin_src AS (SELECT * FROM read_parquet('{fx}/pin_raw.parquet')),
    pin_nn AS (SELECT "index", downloaded,
        {nn}
      FROM pin_src),
    pin_parsed AS (SELECT * REPLACE ({_PARSE_FC} AS follower_count) FROM pin_nn),
    pin_median AS (SELECT CAST(trunc(quantile_cont(follower_count, 0.5)) AS INTEGER) AS m
                   FROM pin_parsed),
    pin_rows AS (SELECT
        CAST("index" AS INTEGER) AS ind,
        unique_id, title, description,
        COALESCE(follower_count, {pin_impute}) AS follower_count,
        COALESCE(poster_name, 'Unknown') AS poster_name,
        tag_list,
        CASE WHEN COALESCE(is_image_or_video, 'Unknown') = 'multi-video(story page format)'
             THEN 'video' ELSE COALESCE(is_image_or_video, 'Unknown') END AS is_image_or_video,
        image_src,
        replace(save_location, 'Local save in ', '') AS save_location,
        COALESCE(category, 'Unknown') AS category,
        downloaded
      FROM pin_parsed),
    pin AS (SELECT DISTINCT * FROM pin_rows),
    geo AS (SELECT CAST(ind AS INTEGER) AS ind, country, latitude, longitude,
                   TRY_CAST("timestamp" AS TIMESTAMP) AS ts
            FROM read_parquet('{fx}/geo_raw.parquet')),
    usr AS (SELECT CAST(ind AS INTEGER) AS ind,
                   concat_ws(' ', first_name, last_name) AS user_name,
                   TRY_CAST(age AS INTEGER) AS age,
                   TRY_CAST(date_joined AS TIMESTAMP) AS date_joined
            FROM read_parquet('{fx}/user_raw.parquet'))"""
