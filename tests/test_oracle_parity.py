"""Oracle-differential tests (SURVEY.md §5 item 1) — the same check the
driver runs: every registry entry with an oracle is executed via Spark
AND via DuckDB on the sf0.001 fixtures and must match exactly
(order-insensitive, columns sorted by name)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import TEST_SF_DIR, assert_frames_match, rewrite_oracle_sf

SPECS = sorted(entrymod.queries().keys())
ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", SPECS)
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    spark_pdf = fn(spark, TEST_SF_DIR).toPandas()
    if name not in ORACLES:
        # rows-only contract: must run and return a stable schema
        assert spark_pdf is not None
        return
    oracle_pdf = duck.execute(rewrite_oracle_sf(ORACLES[name])).fetchdf()
    assert_frames_match(spark_pdf, oracle_pdf, name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) > 0
