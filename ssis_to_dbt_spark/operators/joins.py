"""Join operators beyond the lookup (SURVEY §2.4 J3, J5, J6).

- J3 MergeJoin component (/root/reference/src/parser/constants.py:28,
  README.md:132 maps "Merge Join -> JOIN"): declared as a sorted equi-join of
  two flows. Spark-first: a plain ``join`` — Catalyst chooses
  SortMergeJoin for two large inputs (exactly SSIS's merge join) and
  BroadcastHashJoin when one side is small; we don't hand-schedule it.
- J5 IN-subquery semi-join (SalesFactETL.dtsx:305) -> ``left_semi``.
- J6 dbt ``relationships`` FK test (core/schema.yml:72-88) -> ``left_anti``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def merge_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | Column,
    how: str = "inner",
) -> DataFrame:
    """J3: MergeJoin (INNER/LEFT/FULL). Sortedness is Spark's concern —
    SortMergeJoin sorts shuffle partitions itself; pre-sorted bucketed tables
    skip the sort at scale."""
    if how not in ("inner", "left", "full", "left_outer", "full_outer"):
        raise ValueError(f"MergeJoin supports inner/left/full, got {how}")
    return left.join(right, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | Column) -> DataFrame:
    """J5: WHERE key IN (SELECT key FROM ...) -> left_semi join."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: list[str] | Column) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (left_anti)."""
    return left.join(right, on=on, how="left_anti")


def fk_violations(
    child: DataFrame, parent: DataFrame, fk: str, pk: str | None = None
) -> DataFrame:
    """J6: dbt relationships test — child rows whose FK has no parent row."""
    pk = pk or fk
    parent_keys = parent.select(parent[pk].alias(fk)).distinct()
    return child.join(parent_keys, on=fk, how="left_anti")
