"""Round-13 optimization profiling helper.

Time a named subset of registered entries in isolation (min-of-2 via the
noop sink, same methodology as bench.py) and write each entry's
`.explain('formatted')` to plans/r14/<name>_<tag>.txt.

Usage:
    python tools_r14_profile.py <tag> <entry> [<entry> ...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
        python tools_r14_profile.py before q1_top_priority_per_nation ...

Not part of the driver contract or bench; a working tool for the
optimization round only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_PERCENTILE_MODE", "approx")
os.environ.setdefault("SPARK_GRAFT_DISTINCT_MODE", "approx")
os.environ.setdefault("SPARK_GRAFT_TOPK_MODE", "approx")

from pinterest_data_pipeline400_spark.generator import ensure_fixtures  # noqa: E402
from pinterest_data_pipeline400_spark.session import build_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_name = os.path.basename(os.path.normpath(sf_dir))
    if sf_name.startswith("sf"):
        ensure_fixtures(sf_name)
    spark = build_session(app_name=f"profile_r14_{tag}")

    import __spark_entry__ as entrymod

    qfns = entrymod.queries()
    os.makedirs("plans/r14", exist_ok=True)

    def mat(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm-ups: JVM + python worker daemon (bench.py methodology)
    mat(qfns["q1_top_priority_per_nation"](spark, sf_dir))
    mat(spark.range(1).mapInPandas(lambda it: it, "id long"))

    out: dict[str, object] = {}
    for name in names:
        if name not in qfns:
            out[name] = "MISSING"
            continue
        spark.sparkContext.setJobDescription(f"profile:{name}")
        try:
            df = qfns[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r14/{name}_{tag}.txt", "w") as fh:
                fh.write(plan)
            samples = []
            for _ in range(2):
                t0 = time.perf_counter()
                mat(qfns[name](spark, sf_dir))
                samples.append(time.perf_counter() - t0)
            out[name] = round(min(samples), 4)
        except Exception as exc:  # noqa: BLE001
            out[name] = f"{type(exc).__name__}: {exc}"[:300]
        finally:
            spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
