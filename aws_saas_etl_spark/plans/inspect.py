"""Physical-plan inspection utilities.

The engine's scale story rests on Catalyst doing specific things —
filters reaching the Parquet scan, projections pruning columns, bounded
dims broadcasting, aggregates staying partial. These helpers turn those
properties into assertions so tests (and humans reading ``explain``)
catch regressions: a scan that stops pruning is a 50× I/O bug at 100 TB
long before it is a wrong answer.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Final physical plan as text (AQE may re-plan at runtime; this is
    the initial plan, which carries scan/join/exchange structure)."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's Parquet scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings for every Parquet scan in the plan."""
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", formatted_plan(df))


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each Parquet scan (pruning check)."""
    cols: list[set[str]] = []
    for schema in read_schemas(df):
        inner = schema[len("struct<") : -1]
        names = {part.split(":")[0].strip() for part in inner.split(",") if ":" in part}
        cols.append(names)
    return cols


def count_broadcast_joins(df: DataFrame) -> int:
    return physical_plan(df).count("BroadcastHashJoin")


def count_shuffles(df: DataFrame) -> int:
    """Exchange operators in the initial plan (upper bound: AQE may elide
    some at runtime)."""
    return len(re.findall(r"\bExchange (?:hash|range|Single)", physical_plan(df)))


def count_sortmerge_joins(df: DataFrame) -> int:
    return physical_plan(df).count("SortMergeJoin")


def wholestage_codegen_ids(df: DataFrame, execute: bool = True) -> list[str]:
    """WholeStageCodegen span ids — wider/fewer spans mean more of the
    query runs as a single generated loop. Under AQE the codegen'd final
    plan only exists after execution, so this triggers the query by
    default."""
    if execute:
        # collect() drives THIS DataFrame's query execution (count() would
        # build a different one), so the adaptive plan finalizes in place.
        df.collect()
    # Codegen'd operators carry a `*(N)` prefix in the tree string.
    return sorted(set(re.findall(r"\*\((\d+)\)", physical_plan(df))))


def assert_filter_pushed(df: DataFrame, fragment: str) -> None:
    filters = pushed_filters(df)
    assert any(fragment in f for f in filters), (
        f"expected a pushed filter containing {fragment!r}; got {filters}"
    )


def assert_scan_pruned(df: DataFrame, table_cols: set[str], must_not_read: set[str]) -> None:
    """Assert no scan reads any column in ``must_not_read``."""
    for cols in scan_columns(df):
        if cols & table_cols:  # this scan belongs to the table of interest
            overread = cols & must_not_read
            assert not overread, f"scan reads unpruned columns: {sorted(overread)}"
