"""Plan-quality introspection (see inspect.py)."""

from .inspect import (
    exchange_count,
    formatted_plan,
    has_node,
    join_nodes,
    partial_agg_before_shuffle,
    pushed_filters,
    read_schemas,
    scan_read_columns,
)

__all__ = [
    "exchange_count",
    "formatted_plan",
    "has_node",
    "join_nodes",
    "partial_agg_before_shuffle",
    "pushed_filters",
    "read_schemas",
    "scan_read_columns",
]
