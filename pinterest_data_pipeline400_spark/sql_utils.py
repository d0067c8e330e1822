"""Engine-agnostic SQL fragment generators shared across operator and
plan modules.

Everything here must parse identically on Spark SQL and DuckDB: the
fragments are embedded both in registered Spark plans and in their
DuckDB oracle strings, so cross-engine byte-identical semantics is the
admission rule for this module (no float math, no engine-specific
functions).
"""

from __future__ import annotations


def floor_log2_case_sql(col: str, cap: int) -> str:
    """``CASE WHEN {col} < 2 THEN 0 ... ELSE {cap} END`` —
    floor(log2(col)) by integer comparison up to ``cap`` arms,
    byte-identical on Spark and DuckDB (both parse ANSI CASE; no float
    log anywhere — ln-ratio log2 is inexact at powers of two on the
    JVM). Values below 2 (including 0) take the first arm. Callers pick
    their own cap so unrelated consumers cannot silently retune each
    other (the DP geometric mechanism needs an exact 0..51 range for
    52-bit inputs; the LSH-Ensemble strata saturate at their own
    stratum cap)."""
    whens = " ".join(
        f"WHEN {col} < {1 << (s + 1)} THEN {s}" for s in range(cap)
    )
    return f"CASE {whens} ELSE {cap} END"
