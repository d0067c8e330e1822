"""Streaming guarantees beyond the oracle parity run (SURVEY.md §5
item 4): batch ≡ stream equivalence on identical input, and
checkpointed exactly-once across a stop/restart (kill after the first
drain, add data, resume from the same checkpoint — no dupes, no loss)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pinterest_data_pipeline400_spark.generator import ensure_fixtures
from pinterest_data_pipeline400_spark.operators.clean import clean_pin
from pinterest_data_pipeline400_spark.streaming import (
    RAW_SCHEMAS,
    clean_stream,
    decode_stream,
    read_envelope_stream,
    write_stream_append,
)
from tests.conftest import TEST_SF_NAME


@pytest.fixture(scope="module")
def fx_dir():
    return ensure_fixtures(TEST_SF_NAME)


def _drain(spark, stream_dir, sink, ckpt, table="pin", timeout=300):
    raw = read_envelope_stream(spark, stream_dir)
    cleaned = clean_stream(decode_stream(raw, RAW_SCHEMAS[table]), table)
    q = write_stream_append(cleaned, sink, ckpt)
    try:
        assert q.awaitTermination(timeout), "stream did not drain"
    finally:
        if q.isActive:
            q.stop()
    return spark.read.parquet(sink)


def _norm(pdf):
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(by=list(pdf.columns), ignore_index=True)


def test_batch_stream_equivalence(spark, fx_dir, tmp_path):
    """Same records through the streaming path (envelope decode + clean
    with constant imputation) ≡ the batch clean of the raw parquet with
    the same imputation mode (quirk 1 held constant on both sides)."""
    stream_out = _drain(
        spark, os.path.join(fx_dir, "stream", "pin"),
        str(tmp_path / "sink"), str(tmp_path / "ckpt"),
    ).toPandas()
    batch_out = clean_pin(
        spark.read.parquet(os.path.join(fx_dir, "pin_raw.parquet")),
        impute="constant",
    ).toPandas()
    a, b = _norm(stream_out), _norm(batch_out)
    assert a.equals(b), (len(a), len(b))


def test_checkpoint_restart_no_dupes_no_loss(spark, fx_dir, tmp_path):
    """T4/T5: drain half the files, 'crash', add the rest, resume from
    the SAME checkpoint into the SAME sink — the committed result must
    equal one clean pass over everything (exactly-once)."""
    src = os.path.join(fx_dir, "stream", "user")
    files = sorted(os.listdir(src))
    assert len(files) >= 2
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    for f in files[: len(files) // 2]:
        shutil.copy(os.path.join(src, f), staged)
    first = _drain(spark, staged, sink, ckpt, table="user").toPandas()
    assert 0 < len(first)

    for f in files[len(files) // 2 :]:
        shutil.copy(os.path.join(src, f), staged)
    resumed = _drain(spark, staged, sink, ckpt, table="user").toPandas()

    full_in_one = _drain(
        spark, src, str(tmp_path / "sink2"), str(tmp_path / "ckpt2"), table="user"
    ).toPandas()
    assert _norm(resumed).equals(_norm(full_in_one))
    # no duplicated keys across the restart boundary
    assert resumed.ind.is_unique


def test_stream_decode_matches_schema(spark, fx_dir):
    """T2 decode lands exactly the declared raw schema (explicit, never
    inferred — SURVEY.md §1.3)."""
    raw = read_envelope_stream(spark, os.path.join(fx_dir, "stream", "geo"))
    decoded = decode_stream(raw, RAW_SCHEMAS["geo"])
    assert decoded.schema == RAW_SCHEMAS["geo"]
    assert decoded.isStreaming
