"""Physical-plan quality checks.

The engine's design rule is "let Catalyst do it" (SURVEY §4 O9) — these
helpers make that verifiable: tests assert that filters actually reach
the parquet scan (`PushedFilters`), that column pruning happened
(`ReadSchema`), and that map-side-only transforms introduce no shuffle
(`Exchange`). At 100 TB these plan properties *are* the performance
model, so they are tested like behavior, not eyeballed.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Filter expressions pushed into the (parquet) scan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        inner = m.group(1).strip()
        if inner:
            out.extend(s.strip() for s in inner.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning evidence)."""
    text = explain_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        for field in m.group(1).split(","):
            name = field.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan."""
    return len(re.findall(r"\bExchange\b", explain_str(df, "simple")))


def assert_no_exchange(df: DataFrame, context: str = "") -> None:
    n = count_exchanges(df)
    if n:
        raise AssertionError(
            f"expected shuffle-free plan{f' for {context}' if context else ''}, "
            f"found {n} Exchange(s):\n{explain_str(df, 'simple')}"
        )
