"""CLI runner: the orchestration entry point (SURVEY §3.3)."""

from __future__ import annotations

from pinterest_data_pipeline400_spark.cli import main, register_views
from tests.conftest import TEST_SF_DIR


def test_cli_list(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_top_priority_per_nation  [oracle]" in out
    assert "docs_dup_minhash_pairs  [oracle]" in out


def test_cli_unknown_query_exits_2(spark):
    assert main(["run", "no_such_query"], spark=spark) == 2


def test_cli_run_and_sql(spark, capsys):
    assert main(["run", "q2_yearly_counts", "--sf-dir", TEST_SF_DIR], spark=spark) == 0
    assert "ship_year" in capsys.readouterr().out
    assert (
        main(
            ["sql", "SELECT count(*) AS n FROM nation", "--sf-dir", TEST_SF_DIR],
            spark=spark,
        )
        == 0
    )
    assert "25" in capsys.readouterr().out


def test_register_views_covers_testdata(spark):
    names = register_views(spark, TEST_SF_DIR)
    assert {"orders", "lineitem", "documents", "embeddings", "events"} <= set(names)
