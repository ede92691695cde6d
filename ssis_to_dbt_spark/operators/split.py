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
