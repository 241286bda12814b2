"""Shared fixtures: one SparkSession per test session, one DuckDB
connection with fixture views per scale factor."""

from __future__ import annotations

import duckdb
import pytest

from data_ingest_utils_spark.session import get_session
from data_ingest_utils_spark.sources.readers import TABLES

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_session("dius-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_T2}/{t}.parquet'"
        )
    yield con
    con.close()
