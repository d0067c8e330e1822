"""Second-decade scale lane: measure the spine families at sf1 AND sf10
(100x the default test scale) and report per-family wall growth.

bench_scale.py measures the FIRST decade (sf0.1 -> sf1); the 100 TB
design claims rested on that single measured 10x jump (VERDICT r12
task #3). THIS lane replicates the sf1 tables to sf10 (10x more data:
60M lineitems, 1.24M dedup docs, 6.2M embeddings) and re-times a
deliberately small family set — the sweep itself is the cost at this
scale, so only the spines whose growth exponents carry the 100 TB
story run here:

  * sig_containment     — bottom-k signature containment detector
    (docs_dup_containment_sig): the banded-candidate dedup spine;
  * emb_lsh_neardup     — corpus-count-derived sign-LSH embedding
    near-dup (emb_neardup_pairs): the auto-geometry must ADAPT its
    band bits to the 10x corpus, which no single-scale run proves;
  * substring_spans     — global window-fingerprint span dedup
    (docs_dup_substring_spans): the no-pair-join construction;
  * stream_neardup_warm — the streaming near-dup verdict over the
    persisted band index (stream_neardup_dedup, warm path: one
    untimed priming run builds the content-stamped index first,
    exactly how a production index is amortized across queries);
  * rollup_pricing      — q_pricing_summary (TPC-H Q1 shape): the
    fact-table aggregation floor.

Growth = t(sf10) / t(sf1); the pinned expectation is the SAME <= ~12x
ceiling the first decade uses (linear + constant overheads). Entries
exceeding it land in the JSON's "over_ceiling" and get triaged in
PERF.md. Run:

    python bench_sf10.py          # writes BENCH_SF10.json

Inputs materialize on first use (one-time, outside the timers):
driver tables via scale_fixtures.ensure_sf10 (10 x sf1 key-offset
replicas, per-replica parquet part files), pinterest fixtures via
scale_fixtures.ensure_sf10_fixtures (token-mapped salting /
sign-flipped embeddings — replication, NOT the generator: 1.1M media
payload encodes would dominate the lane).
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

GROWTH_CEILING = 12.0

#: (family, registry entry) — keep this list SHORT; see module docstring
FAMILIES = [
    ("sig_containment", "docs_dup_containment_sig"),
    ("emb_lsh_neardup", "emb_neardup_pairs"),
    ("substring_spans", "docs_dup_substring_spans"),
    ("stream_neardup_warm", "stream_neardup_dedup"),
    ("rollup_pricing", "q_pricing_summary"),
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    try:
        la_start = round(os.getloadavg()[0], 2)
    except OSError:
        la_start = None
    from pinterest_data_pipeline400_spark.generator import ensure_fixtures
    from pinterest_data_pipeline400_spark.scale_fixtures import (
        ensure_sf1,
        ensure_sf10,
        ensure_sf10_fixtures,
    )
    from pinterest_data_pipeline400_spark.session import build_session

    sf1 = ensure_sf1()
    ensure_fixtures("sf1")
    sf10 = ensure_sf10()
    ensure_sf10_fixtures()  # one-time synthesis outside the timers

    spark = build_session(app_name="bench_sf10")

    import __spark_entry__ as entrymod

    qfns = entrymod.queries()

    def timed(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return round(time.perf_counter() - t0, 2)

    def family_runs(sf_dir: str) -> dict[str, float]:
        out: dict[str, float] = {}
        spark.catalog.clearCache()
        # warm path = persisted band index: prime it OUTSIDE the timer
        # (the production amortization — an index is built once per
        # corpus generation and probed by every later query)
        _materialize(qfns["stream_neardup_dedup"](spark, sf_dir))
        for fam, entry in FAMILIES:
            out[fam] = timed(
                lambda e=entry: _materialize(qfns[e](spark, sf_dir))
            )
        return out

    # untimed warm-up (JVM, codegen, Python workers)
    _materialize(qfns["q_pricing_summary"](spark, sf1))
    _materialize(spark.range(1).mapInPandas(lambda it: it, "id long"))

    t1 = family_runs(sf1)
    t10 = family_runs(sf10)

    families = {
        fam: {
            "sf1": t1[fam],
            "sf10": t10[fam],
            "growth": round(t10[fam] / t1[fam], 2) if t1[fam] > 0 else None,
        }
        for fam in t1
    }
    over = sorted(
        fam
        for fam, v in families.items()
        if v["growth"] is not None and v["growth"] > GROWTH_CEILING
    )
    try:
        la_end = round(os.getloadavg()[0], 2)
    except OSError:
        la_end = None
    out = {
        "metric": "sf10_family_growth",
        "decade": "sf1->sf10",
        "replicas_vs_sf1": 10,
        "growth_ceiling": GROWTH_CEILING,
        "families": families,
        "over_ceiling": over,
        "context": {
            "loadavg_start_1m": la_start,
            "loadavg_end_1m": la_end,
            "cpus": os.cpu_count(),
        },
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_SF10.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
