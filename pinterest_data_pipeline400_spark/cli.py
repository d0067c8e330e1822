"""Command-line runner — the orchestration-level entry point SURVEY.md
§3.3 notes the reference only documented (its Airflow DAG is absent
from the snapshot): here it is a real CLI instead.

    python -m pinterest_data_pipeline400_spark list
    python -m pinterest_data_pipeline400_spark run q1_top_priority_per_nation \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m pinterest_data_pipeline400_spark explain docs_dup_minhash_pairs
    python -m pinterest_data_pipeline400_spark sql \
        "SELECT o_orderpriority, count(*) n FROM orders GROUP BY 1"

``sql`` registers every testdata parquet table as a temp view first, so
the full SQL↔DataFrame interop surface is reachable from the shell.
(The raw ``events`` view exposes ``ts`` as the dtype the installed
Spark gives parquet TIMESTAMP(NANOS) — TIMESTAMP_NTZ on Spark 4.x;
registered queries normalize it via ``events_queries._with_event_ts``.)
"""

from __future__ import annotations

import argparse
import os
import sys

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def _registry():
    import __spark_entry__  # noqa: F401  (imports populate the registry)
    from .plans.registry import REGISTRY

    return REGISTRY


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Temp-view every testdata table found under ``sf_dir``."""
    from .schemas import TESTDATA_TABLES

    registered = []
    for t in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)
            registered.append(t)
    return registered


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    parser = argparse.ArgumentParser(prog="pinterest_data_pipeline400_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    for cmd, hlp in (
        ("run", "run a registered query and print rows"),
        ("explain", "print a registered query's physical plan"),
    ):
        p = sub.add_parser(cmd, help=hlp)
        p.add_argument("name")
        p.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
        if cmd == "run":
            p.add_argument("--limit", type=int, default=20)

    p = sub.add_parser("sql", help="run SQL over the testdata temp views")
    p.add_argument("query")
    p.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p.add_argument("--limit", type=int, default=20)

    args = parser.parse_args(argv)
    reg = _registry()

    if args.cmd == "list":
        for name, spec in sorted(reg.specs.items()):
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name}  [{kind}]  {spec.doc.split('.')[0][:100]}")
        return 0

    if args.cmd in ("run", "explain") and args.name not in reg.specs:
        print(f"unknown query: {args.name} (try 'list')", file=sys.stderr)
        return 2

    if spark is None:
        from .session import build_session

        spark = build_session(app_name=f"cli-{args.cmd}")

    # run/explain need no ensure_runtime_confs here: spec.fn is the
    # registry WRAPPER, which pins the correctness confs on every call
    # (plans/registry.py) — the same guarantee the sql path gets
    # explicitly below.
    if args.cmd == "run":
        reg.specs[args.name].fn(spark, args.sf_dir).show(args.limit, truncate=False)
    elif args.cmd == "explain":
        reg.specs[args.name].fn(spark, args.sf_dir).explain("formatted")
    elif args.cmd == "sql":
        from .session import ensure_runtime_confs

        ensure_runtime_confs(spark)
        register_views(spark, args.sf_dir)
        spark.sql(args.query).show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":  # pragma: no cover
    raise SystemExit(main())
