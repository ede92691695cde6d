"""Script-task escape hatch (SURVEY §2.13 F1).

Reference semantics: an SSIS Script Task carries arbitrary C# with a declared
read-only/read-write variable contract and is never auto-converted — it is
flagged ``manual_review_required`` (/root/reference/src/parser/models.py:133-142,
parse at src/parser/ssis_parser.py:448-475); the suggested conversion target
is "Python script / dbt Python model" (output/migration_mapping.json:125-136).

Spark-first mapping: the converted script becomes a PANDAS function over
Arrow batches — never a row-at-a-time Python UDF.  Three shapes:

- ``pandas_scalar_udf``: columnar scalar function (vectorized, keeps the
  surrounding plan in codegen; only the referenced columns cross the Arrow
  boundary).
- ``script_map``: ``mapInPandas`` — arbitrary per-batch rewrite with a
  declared output schema (the analog of a Script Component transform).
- ``script_apply_grouped``: ``applyInPandas`` — per-group logic (shuffles on
  the group keys once; each group's pandas frame must fit an executor).

At 100 TB the rule stays: built-in Columns first, Arrow-batched pandas when
imperative logic is unavoidable, and the batch size bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pandas_scalar_udf(fn: Callable, return_type: T.DataType | str):
    """F1 (scalar shape): wrap a pandas Series -> Series function as a
    vectorized UDF.  ``fn`` receives/returns ``pandas.Series`` — one Arrow
    batch at a time, no per-row Python overhead."""
    return F.pandas_udf(fn, returnType=return_type)


def script_map(
    df: DataFrame,
    fn: Callable[["Iterator"], "Iterator"],
    schema: T.StructType | str,
) -> DataFrame:
    """F1 (transform shape): arbitrary batch-wise rewrite with declared output
    schema — ``fn(iter_of_pdf) -> iter_of_pdf``.  The declared schema mirrors
    the Script Component's explicit output-column metadata."""
    return df.mapInPandas(fn, schema=schema)


def script_apply_grouped(
    df: DataFrame,
    keys: list[str],
    fn: Callable,
    schema: T.StructType | str,
) -> DataFrame:
    """F1 (grouped shape): per-group pandas logic, ``fn(pdf) -> pdf``.
    One shuffle on ``keys``; group size must be executor-memory bounded."""
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)
