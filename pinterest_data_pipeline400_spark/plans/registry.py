"""Query registry: every implemented operator/query registers a Spark
callable plus (where SQL-expressible) a DuckDB oracle SQL string.

This is the engine's public query surface and simultaneously the driver
contract (``__spark_entry__.queries()`` / ``oracle_sql()``). Keeping the
Spark plan and the oracle adjacent in the same module is a deliberate
design rule: they must evolve together (column names, tiebreaks, and
rounding must match exactly — the driver's compare hashes values after
sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    doc: str = ""


class Registry:
    def __init__(self) -> None:
        self._specs: dict[str, QuerySpec] = {}

    def register(self, name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
        def deco(fn: QueryFn) -> QueryFn:
            if name in self._specs:
                raise ValueError(f"duplicate query name: {name}")

            def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
                # The driver hands queries ITS OWN session (not our
                # builder's): pin the correctness-critical runtime confs
                # (UTC, nanos parquet reads, pushdown) on every call.
                from ..session import ensure_runtime_confs

                ensure_runtime_confs(spark)
                # Drop cached blocks left by PREVIOUS entries: operators
                # that persist() mid-pipeline (minhash, ngram) return
                # lazy DataFrames and so cannot unpersist themselves;
                # without this, caches accumulate across a long session
                # and measurably slow later queries. Safe by design: no
                # registered entry depends on another entry's cache.
                spark.catalog.clearCache()
                return fn(spark, sf_dir)

            wrapped.__name__ = fn.__name__
            wrapped.__doc__ = fn.__doc__
            self._specs[name] = QuerySpec(name, wrapped, oracle, doc)
            return fn  # callers (and intra-module calls) keep the raw fn

        return deco

    @property
    def specs(self) -> dict[str, QuerySpec]:
        return dict(self._specs)

    def queries(self) -> dict[str, QueryFn]:
        return {n: s.fn for n, s in self._specs.items()}

    def oracles(self) -> dict[str, str]:
        return {n: s.oracle for n, s in self._specs.items() if s.oracle is not None}


REGISTRY = Registry()
