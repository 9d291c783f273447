"""Shared fixtures: one SparkSession per test run, DuckDB oracle connection."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from duckdb_pgwire_spark.session import TABLES, build_session, table_path  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_session(app_name="pytest", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the fixture tables pre-registered as views,
    mirroring the driver's oracle setup (``__spark_entry__.py`` docstring)."""
    con = duckdb.connect()
    for name in TABLES:
        for sf, prefix in ((SF_DIR, ""), (SF_SMALL, "sf0001_")):
            path = table_path(sf, name)
            if Path(path).exists():
                con.execute(
                    f"CREATE VIEW {prefix}{name} AS SELECT * FROM read_parquet('{path}')"
                )
    yield con
    con.close()
