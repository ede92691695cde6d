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
from pyspark.sql import functions as F


def union_all(*dfs: DataFrame, allow_missing: bool = False) -> DataFrame:
    """U1: UnionAll of N inputs by column name."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=allow_missing)
    return out


def merge_sorted(a: DataFrame, b: DataFrame, sort_keys: list[Column | str]) -> DataFrame:
    """U2: Merge component — sorted union of two sorted flows."""
    return a.unionByName(b).orderBy(*sort_keys)


def sort(
    df: DataFrame,
    keys: list[Column | str],
    within_partitions: bool = False,
    ci: bool = False,
) -> DataFrame:
    """O1: Sort component.

    ``ci=True`` (r12, r11 VERDICT #4): SQL Server default-collation
    ORDER BY on STRING keys — rows order by each string key's
    ``lower()`` fold (so 'apple' sorts between 'APPLE''s neighbors, not
    after every uppercase value), with the ORIGINAL value as an
    immediate deterministic tiebreaker inside each CI-equal run (SQL
    Server's CI order within equal keys is arbitrary; the original-case
    tiebreak is the portable choice).  Requires list-form string key
    NAMES; non-string keys pass through unchanged.  Output rows keep
    their original case — only the ordering folds."""
    if ci:
        if not all(isinstance(k, str) for k in keys):
            raise ValueError("sort(ci=True) requires list-form key names")
        dtypes = dict(df.dtypes)
        folded: list[Column] = []
        for k in keys:
            if dtypes.get(k, "").startswith(("string", "varchar", "char")):
                folded.append(F.lower(F.col(k)))
                folded.append(F.col(k))
            else:
                folded.append(F.col(k))
        keys = folded
    if within_partitions:
        return df.sortWithinPartitions(*keys)
    return df.orderBy(*keys)


def distinct_values(
    df: DataFrame, cols: list[str], ci: bool = False
) -> DataFrame:
    """DISTINCT projection over ``cols``.

    ``ci=True``: CI-collation DISTINCT — string values differing only by
    case collapse to ONE row, surfaced as the MIN-case representative
    (deterministic stand-in for SQL Server's arbitrary first-seen; see
    :func:`~.aggregate.grouped_aggregate`).  A mixed-case migration
    otherwise reports a HIGHER distinct cardinality than the source
    server.  Same plan shape as ``distinct()``: one hash agg with
    map-side partial combine."""
    if not ci:
        return df.select(*cols).distinct()
    from .aggregate import grouped_aggregate

    out = grouped_aggregate(
        df.select(*cols), cols, {"__n": F.count(F.lit(1))}, ci=True
    )
    return out.drop("__n")
