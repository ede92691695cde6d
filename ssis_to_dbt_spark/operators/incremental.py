"""Incremental / watermark operators (SURVEY §2.1 S8, §2.5 A6/A8, §2.10 D3).

Reference semantics: incremental loads scan
``WHERE ModifiedDate >= ?`` with the watermark read from a sync log
(/root/reference/samples/ssis_packages/CustomerDataLoad.dtsx:69-78,
InventorySync.dtsx:58-65); the dbt rewrite is
``WHERE updated_at > (SELECT MAX(updated_at) FROM {{ this }})``
(src/agents/builder.py:322-326) plus scalar MIN/MAX dimension-key bounds
(agg_daily_sales.sql:42-53).

Spark-first: the watermark is a SCALAR — computing it is a one-row aggregate
(cheap at any scale, and at 100 TB it prunes the incremental scan down to new
partitions via parquet min/max stats + partition pruning when the table is
date-partitioned). The scalar lands driver-side by design; this is a bound
lookup, not a data-path collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def max_watermark(target: DataFrame, col: str):
    """A8: SELECT MAX(col) FROM target -> python scalar (None if empty)."""
    row = target.agg(F.max(col).alias("wm")).first()
    return row["wm"] if row else None


def watermark_filter(
    source: DataFrame, col: str, watermark, inclusive: bool = False
) -> Column | DataFrame:
    """S8/D3: incremental predicate scan. ``watermark=None`` (first run) scans
    the full source — same contract as dbt's is_incremental() false branch."""
    if watermark is None:
        return source
    pred = F.col(col) >= F.lit(watermark) if inclusive else F.col(col) > F.lit(watermark)
    return source.filter(pred)


def scalar_bound(dim: DataFrame, key_col: str, where: Column, agg: str = "min"):
    """A6: scalar MIN/MAX subquery bound (agg_daily_sales.sql:43-52)."""
    fn = F.min if agg == "min" else F.max
    row = dim.filter(where).agg(fn(key_col).alias("b")).first()
    return row["b"] if row else None


def incremental_merge(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    watermark_col: str,
) -> DataFrame:
    """D3: incremental 'merge' materialization without Delta — new/changed
    source rows (past the target watermark) replace target rows with the same
    key; everything else passes through.  Equivalent plan: anti-join target
    against the delta (shuffle on the merge keys) + union."""
    wm = max_watermark(target, watermark_col)
    delta = watermark_filter(source, watermark_col, wm)
    kept = target.join(delta.select(*keys).distinct(), on=keys, how="left_anti")
    return kept.unionByName(delta.select(*target.columns))
