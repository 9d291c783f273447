"""Oracle-differential tests: every registry entry vs DuckDB at sf0.01.

This is the local mirror of the driver's t2 correctness gate (SURVEY.md
§5.2): per query, row-count + schema-class + order-insensitive values.
Entries registered with ``oracle=None`` get a rows-only smoke check, the
same weaker check the driver records for them.
"""

from __future__ import annotations

import pytest

from duckdb_pgwire_spark.registry import load_all

from .conftest import SF_DIR
from .diffcheck import compare_spark_vs_duckdb

DEFS = load_all()


@pytest.mark.parametrize("name", sorted(DEFS))
def test_query_vs_oracle(name, spark, oracle):
    qd = DEFS[name]
    df = qd.fn(spark, SF_DIR)
    if qd.oracle is None:
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        assert len(df.schema) > 0
    else:
        compare_spark_vs_duckdb(df, oracle, qd.oracle, name=name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.schema == e.entry(spark).schema  # stable schema


def test_contract_shape():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert "q1_pricing_summary" in qs
