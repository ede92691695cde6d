"""Multi-output routing operators (SURVEY §2.9 M1/M2).

- M1 ConditionalSplit (/root/reference/src/parser/constants.py:30,
  README.md:131 "Conditional Split -> CASE WHEN, multiple outputs"): each row
  goes to the FIRST output whose predicate matches, else the default output.
- M2 DataConversion (constants.py:34): typed copy of columns.

Spark-first: two shapes are provided.  ``conditional_split_tagged`` is the
scale path — ONE pass that tags each row with its route (chained
``F.when``), suitable for a partitioned write (``.write.partitionBy('route')``)
so a 100 TB input is read once, not once per output.  ``conditional_split``
returns per-output DataFrames (the literal SSIS shape) for when downstream
branches genuinely need independent plans; cache the parent before fanning
out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conditional_split_tagged(
    df: DataFrame,
    outputs: list[tuple[str, Column]],
    default_name: str = "default",
    route_col: str = "route",
) -> DataFrame:
    """M1 (single-pass): first-match route tag column."""
    expr = None
    for name, pred in outputs:
        expr = F.when(pred, F.lit(name)) if expr is None else expr.when(pred, F.lit(name))
    expr = F.lit(default_name) if expr is None else expr.otherwise(F.lit(default_name))
    return df.withColumn(route_col, expr)


def conditional_split(
    df: DataFrame,
    outputs: list[tuple[str, Column]],
    default_name: str = "default",
) -> dict[str, DataFrame]:
    """M1 (multi-frame): first-match filtered DataFrames, SSIS-shaped."""
    result: dict[str, DataFrame] = {}
    not_prior = F.lit(True)
    for name, pred in outputs:
        result[name] = df.filter(not_prior & pred)
        not_prior = not_prior & ~F.coalesce(pred, F.lit(False))
    result[default_name] = df.filter(not_prior)
    return result


def data_conversion(df: DataFrame, conversions: dict[str, tuple[str, object]]) -> DataFrame:
    """M2: add typed copies — ``{new_col: (source_col, type)}`` mirrors the
    SSIS component's 'Copy of X' output columns."""
    out = df
    for new_col, (src, dtype) in conversions.items():
        out = out.withColumn(new_col, F.col(src).cast(dtype))
    return out


def pivot_aggregate(
    df: DataFrame,
    group_cols: list[str],
    pivot_col: str,
    pivot_values: list[str],
    agg: Column,
) -> DataFrame:
    """SSIS Pivot transform analog: rows keyed by ``pivot_col`` become one
    column per value in ``pivot_values``.

    ``pivot_values`` is REQUIRED, not inferred: Spark-side, an explicit value
    list skips the extra distinct-collection job and keeps the output schema
    static (a pivot whose width depends on the data is a schema-drift bug
    waiting at scale); it also mirrors SSIS, where the pivot key set is
    declared in the component.  One shuffle on ``group_cols`` — the pivot
    itself is map-side CASE dispatch inside the same hash aggregate."""
    return (
        df.groupBy(*group_cols)
        .pivot(pivot_col, pivot_values)
        .agg(agg)
    )


def unpivot(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    var_name: str = "name",
    value_name: str = "value",
) -> DataFrame:
    """SSIS Unpivot transform analog (melt): ``value_cols`` become
    (``var_name``, ``value_name``) rows — pure map-side row expansion, no
    shuffle at any size."""
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )
