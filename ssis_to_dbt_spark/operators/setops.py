"""Set operators (SURVEY §2.8 U1/U2, §2.7 O1).

- U1 UnionAll (/root/reference/src/parser/constants.py:29): bag union by
  column NAME (SSIS maps inputs by lineage id, not position) ->
  ``unionByName``.
- U2 Merge (constants.py:27): union of two sorted inputs preserving sort.
  Spark has no streaming merge primitive at the DataFrame level and doesn't
  need one — a union followed by ``orderBy`` yields the same multiset in the
  same order; at scale the sort is a range-partitioned shuffle rather than a
  2-way merge, which parallelizes better anyway.
- O1 Sort component (constants.py:32): global ``orderBy`` (a range shuffle)
  or ``sortWithinPartitions`` when only per-partition order matters (the
  cheap option feeding a merge join or partitioned write).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame


def union_all(*dfs: DataFrame, allow_missing: bool = False) -> DataFrame:
    """U1: UnionAll of N inputs by column name."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=allow_missing)
    return out


def merge_sorted(a: DataFrame, b: DataFrame, sort_keys: list[Column | str]) -> DataFrame:
    """U2: Merge component — sorted union of two sorted flows."""
    return a.unionByName(b).orderBy(*sort_keys)


def sort(df: DataFrame, keys: list[Column | str], within_partitions: bool = False) -> DataFrame:
    """O1: Sort component."""
    if within_partitions:
        return df.sortWithinPartitions(*keys)
    return df.orderBy(*keys)
