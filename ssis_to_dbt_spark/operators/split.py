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


def data_conversion_with_errors(
    df: DataFrame,
    conversions: dict[str, tuple[str, str]],
    route_col: str = "conv_route",
    error_col: str = "conv_error_col",
    ok_name: str = "converted",
    error_name: str = "error",
) -> DataFrame:
    """M2 with SSIS error-output semantics: every SSIS dataflow component
    routes rows whose conversion FAILS to an error output carrying the
    failing column (ErrorColumn).  Spark-first single-pass shape:
    ``try_cast`` each conversion, tag the row's route, and record the FIRST
    failing source column — a failure is a non-null input whose cast came
    back null (a null input is a legitimate null, not an error).  Route the
    tagged frame with a partitioned write (or filter) downstream; the 100 TB
    input is scanned once, not once per output."""
    if not conversions:
        return df.withColumn(route_col, F.lit(ok_name)).withColumn(
            error_col, F.lit(None).cast("string")
        )
    # One single select: every expression (casts, error tests) is evaluated
    # against the INPUT frame, so an in-place conversion (new_col == src)
    # still error-tests the ORIGINAL value, not its own null cast output.
    cast_expr = {
        new: F.expr(f"try_cast({src} AS {dtype})")
        for new, (src, dtype) in conversions.items()
    }
    err_expr = None
    first_err = None
    for new, (src, _dtype) in conversions.items():
        this_err = F.col(src).isNotNull() & cast_expr[new].isNull()
        err_expr = this_err if err_expr is None else (err_expr | this_err)
        first_err = (
            F.when(this_err, F.lit(src))
            if first_err is None
            else first_err.when(this_err, F.lit(src))
        )
    targets = set(conversions)
    cols = [
        cast_expr[c].alias(c) if c in targets else F.col(c) for c in df.columns
    ]
    cols += [
        cast_expr[new].alias(new) for new in conversions if new not in df.columns
    ]
    return df.select(
        *cols,
        F.when(err_expr, F.lit(error_name))
        .otherwise(F.lit(ok_name))
        .alias(route_col),
        first_err.otherwise(F.lit(None)).alias(error_col),
    )


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
