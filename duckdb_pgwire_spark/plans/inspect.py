"""Physical-plan introspection helpers.

The reference delegates all planning to DuckDB and exposes nothing; our
engine's planning contract is Catalyst's, and THIS module is how we hold
it to account: tests assert that filters/projections reach the parquet
scans, that dimension joins broadcast, that aggregates are partial
before the shuffle, and that ORDER BY+LIMIT fuses to a top-k — the
observable effects DuckDB v1.1.1 provides on the reference's side
(SURVEY.md §4.2 mapping table).

Used by tests/test_plans.py (plan-quality gate) and handy at the REPL
when tuning a query.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The `explain("formatted")` text (initial physical plan; AQE may
    re-plan at runtime — assertions on broadcastability use the static
    plan, which is what a reviewer reads)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def simple_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into parquet scans (flattened across scans)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(f.strip() for f in m.group(1).split(",") if f.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of each parquet scan — column pruning evidence."""
    return re.findall(r"ReadSchema: (\S+)", formatted_plan(df))


def scan_read_columns(df: DataFrame) -> list[set[str]]:
    """Column-name sets actually read by each scan."""
    cols = []
    for schema in read_schemas(df):
        cols.append(set(re.findall(r"(\w+):", schema)))
    return cols


def join_nodes(df: DataFrame) -> list[str]:
    """Physical join operator names in plan order, e.g.
    ['BroadcastHashJoin', 'SortMergeJoin']."""
    return re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        formatted_plan(df),
    )


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchanges (excluding broadcast exchanges) in the
    static plan — every one is a full network materialization at scale.
    Counted on the simple-mode plan where each node prints once
    (formatted mode lists every node twice: tree + details)."""
    return len(re.findall(r"\bExchange hashpartitioning|\bExchange rangepartitioning|\bExchange RoundRobinPartitioning|\bExchange SinglePartition", simple_plan(df)))


def has_node(df: DataFrame, node: str) -> bool:
    return node in formatted_plan(df)


def partial_agg_before_shuffle(df: DataFrame) -> bool:
    """True when a HashAggregate appears on the map side of the exchange
    (map-side combine: shuffle volume is O(groups), not O(rows))."""
    plan = simple_plan(df)
    # simple-mode plan prints leaves last: partial agg is BELOW (after)
    # the exchange line textually
    m = re.search(
        r"HashAggregate.*?Exchange.*?HashAggregate", plan, flags=re.DOTALL
    )
    return m is not None
