"""Dataset profiling operator — per-column QA statistics.

The training-data-pipeline complement of the V1-V4 checks: one distributed
pass computing, per requested column, row/null/distinct counts and min/max.
Everything reduces to a single aggregation (one job, no collect of data);
``approximate=True`` swaps exact distinct counts for HyperLogLog sketches
(``approx_count_distinct``) — at 100 TB the exact variant costs one extra
shuffle per column, the sketch costs none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dataset_profile(
    df: DataFrame, columns: list[str], approximate: bool = False
) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_null, n_distinct,
    min_value, max_value) — min/max cast to string so mixed types stack."""
    distinct_fn = F.approx_count_distinct if approximate else F.countDistinct
    profiles = []
    for c in columns:
        col = F.col(c)
        profiles.append(
            df.agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.count(F.when(col.isNull(), 1)).alias("n_null"),
                distinct_fn(col).alias("n_distinct"),
                F.min(col).cast("string").alias("min_value"),
                F.max(col).cast("string").alias("max_value"),
            )
        )
    out = profiles[0]
    for p in profiles[1:]:
        out = out.unionByName(p)
    return out
