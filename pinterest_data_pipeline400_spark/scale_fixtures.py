"""sf1 driver-table fixtures: a real 10x scale jump for the scale lane.

The driver ships parquet at sf0.001/0.01/0.1 under /root/testdata (a
read-only mount), so the 10x lane materializes its own sf1 under the
repo's ``.fixtures/testdata/sf1`` by replicating sf0.1 ten times with
disjoint key spaces — the same construction the 40x stress tests use,
promoted to the full table set:

  * every synthetic key (custkey, orderkey, partkey, suppkey, event_id,
    user_id, doc_id, vec_id) offsets by ``replica * 10_000_000``, so
    foreign-key joins stay consistent within a replica and cardinality
    genuinely grows 10x (15k -> 150k customers, 600k -> 6M lineitems);
  * ``region``/``nation`` stay fixed — they are bounded dimensions at
    any scale (25 nations at 100 TB too);
  * ``documents.text`` salts every 3rd token with a replica tag for
    replicas > 0 (the stress-test perturbation): cross-replica shingle
    Jaccard lands ~0.33, far under tau 0.5, so the near-dup pair count
    scales LINEARLY with the corpus instead of exploding quadratically
    across identical copies;
  * ``embeddings`` replicate with offset vec_ids (vector content
    repeats; ANN cost depends on corpus size and bucket occupancy, not
    vector novelty — ties resolve by the deterministic id tiebreak).

Timestamps and dates are kept as-is: 10x rows in the same window is
densification, which is how real traffic scales; per-user/per-day
window sizes grow accordingly.

The pinterest-side fixtures (docs_dup, emb_dup, media) need no special
handling: ``fixture_dir_for`` maps any ``*/sf1`` dir onto
``ensure_fixtures("sf1")``, whose generator already scales by sf name
(sf_rows("sf1") = 1.1M).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd

from .generator import REPO_ROOT

SF1_ROOT = os.path.join(REPO_ROOT, ".fixtures", "testdata")
SF1_VERSION = "1"
SF1_REPLICAS = 10
SF1_OFFSET = 10_000_000
SRC_SF = "/root/testdata/sf0.1"

#: key columns to offset per replica, per table
_KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
_FIXED = ["region", "nation"]


def _salt_text(text: str, rep: int) -> str:
    toks = text.split(" ")
    return " ".join(
        f"r{rep}_{t}" if i % 3 == 0 else t for i, t in enumerate(toks)
    )


def ensure_sf1(src_sf: str = SRC_SF, root: str = SF1_ROOT) -> str:
    """Idempotently materialize the sf1 tables; returns the sf1 dir."""
    out_dir = os.path.join(root, "sf1")
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == SF1_VERSION:
                return out_dir
    staging = f"{out_dir}.tmp.{os.getpid()}"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging, exist_ok=True)
    for t in _FIXED:
        pd.read_parquet(os.path.join(src_sf, f"{t}.parquet")).to_parquet(
            os.path.join(staging, f"{t}.parquet"), index=False
        )
    for t, keys in _KEYED.items():
        base = pd.read_parquet(os.path.join(src_sf, f"{t}.parquet"))
        reps = []
        for rep in range(SF1_REPLICAS):
            r = base.copy()
            for k in keys:
                r[k] = r[k] + np.int64(rep * SF1_OFFSET)
            if t == "documents" and rep > 0:
                r["text"] = [_salt_text(x, rep) for x in r["text"]]
                r["n_chars"] = r["text"].str.len().astype(base["n_chars"].dtype)
            reps.append(r)
        pd.concat(reps, ignore_index=True).to_parquet(
            os.path.join(staging, f"{t}.parquet"), index=False
        )
    # Atomic publish (ADVICE r9): the marker is written INTO the staging
    # dir first, so the os.rename below is the single publish point — a
    # concurrent reader either sees the complete marked generation or
    # none at all, never a renamed-but-unmarked dir. If the rename loses
    # to a concurrent builder, re-check their marker and yield (the
    # cached_frame idiom) instead of interleaving rmtree/rename.
    with open(os.path.join(staging, "_DONE"), "w") as fh:
        fh.write(SF1_VERSION)
    shutil.rmtree(out_dir, ignore_errors=True)
    try:
        os.rename(staging, out_dir)
    except OSError:
        shutil.rmtree(staging, ignore_errors=True)
        with open(marker) as fh:
            if fh.read().strip() != SF1_VERSION:
                raise
    return out_dir
