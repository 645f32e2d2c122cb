"""Plan-quality introspection helpers."""

from spark_ifs_spark.plans.checks import (
    assert_no_exchange,
    count_exchanges,
    explain_str,
    pushed_filters,
    read_schema_columns,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "count_exchanges",
    "assert_no_exchange",
]
