"""sf1 fixture-generator contracts (scale_fixtures.py): the 10x tables
must preserve referential integrity per replica, grow cardinality
exactly 10x, and salt document text so the dedup spine cannot
cross-match replicas. duckdb-only — no Spark session needed."""

from __future__ import annotations

import duckdb
import pytest

from pinterest_data_pipeline400_spark.scale_fixtures import (
    SF1_OFFSET,
    SF1_REPLICAS,
    SRC_SF,
    ensure_sf1,
)


@pytest.fixture(scope="module")
def sf1() -> str:
    return ensure_sf1()


def _one(sql: str):
    return duckdb.sql(sql).fetchone()


def test_cardinality_grows_exactly_10x(sf1):
    for t in ["customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"]:
        n0 = _one(f"SELECT count(*) FROM '{SRC_SF}/{t}.parquet'")[0]
        n1 = _one(f"SELECT count(*) FROM '{sf1}/{t}.parquet'")[0]
        assert n1 == SF1_REPLICAS * n0, t
    for t in ["region", "nation"]:  # bounded dimensions stay fixed
        n0 = _one(f"SELECT count(*) FROM '{SRC_SF}/{t}.parquet'")[0]
        n1 = _one(f"SELECT count(*) FROM '{sf1}/{t}.parquet'")[0]
        assert n1 == n0, t


def test_foreign_keys_stay_consistent_within_replicas(sf1):
    # every lineitem resolves to an order of the SAME replica, and
    # every order to a customer of the same replica — zero orphans
    orphans = _one(f"""
        SELECT count(*) FROM '{sf1}/lineitem.parquet' l
        LEFT JOIN '{sf1}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderkey IS NULL""")[0]
    assert orphans == 0
    orphans = _one(f"""
        SELECT count(*) FROM '{sf1}/orders.parquet' o
        LEFT JOIN '{sf1}/customer.parquet' c ON c.c_custkey = o.o_custkey
        WHERE c.c_custkey IS NULL""")[0]
    assert orphans == 0
    # and cross-replica joins are structurally impossible: key // OFFSET
    # identifies the replica on both sides of every FK
    mixed = _one(f"""
        SELECT count(*) FROM '{sf1}/lineitem.parquet' l
        JOIN '{sf1}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_orderkey // {SF1_OFFSET} <> l.l_partkey // {SF1_OFFSET}""")[0]
    assert mixed == 0


def test_documents_are_salted_per_replica(sf1):
    # replica 0 is byte-identical to the source; later replicas tag
    # every 3rd token, so cross-replica shingle overlap collapses
    same = _one(f"""
        SELECT count(*) FROM '{sf1}/documents.parquet' s
        JOIN '{SRC_SF}/documents.parquet' b ON b.doc_id = s.doc_id
        WHERE s.text = b.text""")[0]
    n0 = _one(f"SELECT count(*) FROM '{SRC_SF}/documents.parquet'")[0]
    assert same == n0
    r1_tagged = _one(f"""
        SELECT count(*) FROM '{sf1}/documents.parquet'
        WHERE doc_id // {SF1_OFFSET} = 1 AND text NOT LIKE 'r1\\_%' ESCAPE '\\'""")[0]
    assert r1_tagged == 0
