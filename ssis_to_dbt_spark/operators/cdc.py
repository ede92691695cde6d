"""Change-data-capture style snapshot diff.

SSIS ships CDC Source / CDC Splitter components that classify rows into
insert/update/delete streams, and the reference's incremental models replay
the same classification in SQL (``InventorySync.dtsx`` audit inserts + flag
updates; dbt incremental merge in ``src/generator/model_generator.py``).
This module re-expresses snapshot diffing Spark-first: one full-outer join
on the business key, change detection via a null-safe column comparison —
no MERGE statement, no row-by-row lookup.

100 TB shape: the diff is a single sort-merge (or, with bucketed snapshots,
co-located zero-shuffle) full-outer join on the key columns; change
detection is a codegen'd projection on the joined row.  No window, no
driver-side state.  For daily 100 TB snapshots the two sides should be
written bucketed by the key (``sources/writers.py:write_bucketed``) so the
join needs no exchange at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHANGE_COL = "change_type"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Classify rows between two snapshots as I(nsert)/U(pdate)/D(elete).

    Returns one row per changed key: the key columns, ``change_type``
    ('I' | 'U' | 'D'), and ``old_<c>`` / ``new_<c>`` for every compare
    column.  Unchanged keys are dropped.  NULLs compare null-safely
    (NULL == NULL is *not* a change), matching T-SQL MERGE semantics with
    ``INTERSECT``-style change detection.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    o = old.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__in_old__"),
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k) for k in keys],
        F.lit(True).alias("__in_new__"),
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    joined = o.join(n, list(keys), "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    kind = (
        F.when(F.col("__in_old__").isNull(), F.lit("I"))
        .when(F.col("__in_new__").isNull(), F.lit("D"))
        .when(changed, F.lit("U"))
    )
    return (
        joined.withColumn(CHANGE_COL, kind)
        .filter(F.col(CHANGE_COL).isNotNull())
        .drop("__in_old__", "__in_new__")
    )


def apply_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    seq_col: str,
    op_col: str = CHANGE_COL,
) -> DataFrame:
    """Apply a CDC changelog to a snapshot (the inverse of
    :func:`snapshot_diff`; the Spark-first analog of Delta's
    ``APPLY CHANGES INTO`` / T-SQL MERGE fed from a CDC stream).

    ``changes`` carries the key columns, every snapshot payload column,
    ``op_col`` in {'I','U','D'} and a monotonically increasing ``seq_col``.
    Per key, only the HIGHEST-``seq_col`` change wins (late-arriving earlier
    changes are superseded); on an exact seq tie the op ordering
    'D' < 'I' < 'U' breaks deterministically in favor of 'D'.  A winning
    'D' removes the key; a winning 'I'/'U' upserts the change row.

    Scale shape: one shuffle on ``keys`` for the last-change window, then a
    key anti-join against the snapshot — rank state is per-key, never
    global.  With snapshot and changelog both bucketed by the key the
    anti-join needs no exchange; the changelog side is usually a small
    fraction of the snapshot, so AQE broadcasts it.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(seq_col).desc(), F.col(op_col)
    )
    last = (
        changes.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )
    payload = [c for c in snapshot.columns]
    upserts = last.filter(F.col(op_col) != "D").select(*payload)
    untouched = snapshot.join(last.select(*keys), list(keys), "left_anti")
    return untouched.unionByName(upserts)
