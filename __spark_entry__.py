"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator/query (SURVEY.md §2), one
callable per name, taking (spark, sf_dir) and returning a DataFrame.
``oracle_sql()`` — matching ANSI SQL for DuckDB over the same parquet
tables (views: region nation customer supplier part orders lineitem
events documents embeddings). Entries absent here get a rows-only check.

All real logic lives in ``pinterest_data_pipeline400_spark``; this module
only adapts the registry to the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import importlib

# Importing the plan modules populates the registry.
from pinterest_data_pipeline400_spark.plans import (  # noqa: F401
    events_queries,
    pinterest_queries,
    tpch_queries,
)


def _import_plan_module(name: str) -> None:
    """Import a not-yet-shipped plan module. Only a missing module itself
    is tolerated; a genuine ImportError raised *inside* an existing
    module propagates (so a broken dependency can't silently drop its
    queries from the correctness gate)."""
    modname = f"pinterest_data_pipeline400_spark.plans.{name}"
    try:
        importlib.import_module(modname)
    except ModuleNotFoundError as exc:
        if exc.name != modname:
            raise


_import_plan_module("training_data")
_import_plan_module("streaming_queries")
_import_plan_module("source_queries")

from pinterest_data_pipeline400_spark.plans.registry import REGISTRY

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q1 exercises the whole spine: parquet scan → broadcast + shuffle
    joins → hash aggregate → window top-1 per group.
    """
    from pinterest_data_pipeline400_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)  # the driver's session, not our builder's
    return tpch_queries.q1_top_priority_per_nation(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return REGISTRY.queries()


def oracle_sql() -> dict[str, str]:
    return REGISTRY.oracles()
