"""Z-order (Morton-curve) data layout for multi-dimensional pruning.

At 100 TB a table is usually range-filtered on MORE than one column
(user + time, key + date).  Partitioning can only serve one of them;
Z-ordering interleaves the bits of two range-scaled dimensions into a
single clustering key so that sorting by that key co-locates rows that are
close in BOTH dimensions — then every file's min/max footer stats cover a
narrow rectangle and a two-dimensional predicate prunes files instead of
scanning them (the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``).

Everything here is exact integer arithmetic in built-in expressions
(shifts by literal counts, bitwise and/or, remainder-based integer
division), so the curve key is engine-portable and the whole layout
decision is oracle-checkable — no floating point anywhere on the key path.

Design for scale:
- the per-dimension (min, max) bounds come from ONE scalar aggregate
  (model-sized, like a watermark scan) attached via a 1-row broadcast
  crossJoin — the data path itself never shuffles to compute keys;
- ``zorder_write`` lays files out with ``repartitionByRange`` on the key
  (range exchange = the one unavoidable shuffle of any re-clustering) plus
  ``sortWithinPartitions`` so every output file covers a contiguous curve
  segment;
- ``zorder_stats`` folds the keyed rows into per-curve-bucket rectangles —
  the exact min/max metadata a pruning reader would consult, and the
  measurable proof that the layout localizes both dimensions.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer division for non-negative operands: ``(a - a % b) / b``
    — the numerator is an exact multiple of ``b``, so the double division is
    exact for quotients < 2^53 (a plain ``floor(a / b)`` can round up across
    an integer boundary when ``b`` is large)."""
    return ((a - F.pmod(a, b)) / b).cast("long")


def morton_interleave(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer columns
    into a single Morton key: x occupies even bit positions, y odd ones.
    Shift counts are literals, so the whole key is codegen'd JVM arithmetic.
    """
    terms = []
    for b in range(bits):
        terms.append(
            F.shiftleft(F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b)
        )
        terms.append(
            F.shiftleft(F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        )
    return reduce(lambda a, c: a.bitwiseOR(c), terms).cast("long")


def zorder_key(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 16,
    key_col: str = "_z",
) -> DataFrame:
    """Attach a Z-order key over two integer-valued columns.

    Each dimension is range-scaled to ``[0, 2^bits)`` with exact integer
    arithmetic — ``(v - min) * (2^bits - 1) DIV (max - min)`` — so equal
    inputs always get equal keys on every engine (a float normalization
    would make file boundaries platform-dependent).  A constant dimension
    (min == max) scales to 0.  Bounds are one scalar aggregate broadcast
    back as a single row.

    ``bits=16`` keeps ``(max - min) * 65535`` within 2^53, exact for any
    dimension span below ~137 billion; wider spans should pre-bucket.
    """
    x, y = F.col(col_x).cast("long"), F.col(col_y).cast("long")
    bounds = df.agg(
        F.min(x).alias("_xmin"),
        F.max(x).alias("_xmax"),
        F.min(y).alias("_ymin"),
        F.max(y).alias("_ymax"),
    )
    top = F.lit((1 << bits) - 1).cast("long")

    def scaled(v: Column, vmin: Column, vmax: Column) -> Column:
        rng = vmax - vmin
        return F.when(rng > 0, _idiv((v - vmin) * top, rng)).otherwise(
            F.lit(0).cast("long")
        )

    keyed = df.crossJoin(F.broadcast(bounds))
    z = morton_interleave(
        scaled(x, F.col("_xmin"), F.col("_xmax")),
        scaled(y, F.col("_ymin"), F.col("_ymax")),
        bits,
    )
    return keyed.withColumn(key_col, z).drop("_xmin", "_xmax", "_ymin", "_ymax")


def zorder_write(
    df: DataFrame,
    path: str,
    col_x: str,
    col_y: str,
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Re-cluster ``df`` along the Morton curve and write parquet: one range
    exchange on the key, a within-partition sort, key dropped on write.
    Every output file then covers a contiguous curve segment = a narrow
    min/max rectangle in (col_x, col_y) for footer-stats pruning."""
    keyed = zorder_key(df, col_x, col_y, bits)
    (
        keyed.repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_stats(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 16,
    bucket_bits: int = 8,
) -> DataFrame:
    """Per-curve-bucket clustering rectangles: bucket = the top
    ``bucket_bits`` bits of the Morton key (2^bucket_bits contiguous curve
    segments), with row count and min/max of BOTH dimensions per bucket —
    the pruning metadata a Z-ordered layout exposes, as a checkable
    DataFrame.  One hash aggregation on the bucket id."""
    keyed = zorder_key(df, col_x, col_y, bits)
    shift = 2 * bits - bucket_bits
    x, y = F.col(col_x).cast("long"), F.col(col_y).cast("long")
    return (
        keyed.withColumn("z_bucket", F.shiftright(F.col("_z"), shift))
        .groupBy("z_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(x).alias("x_min"),
            F.max(x).alias("x_max"),
            F.min(y).alias("y_min"),
            F.max(y).alias("y_max"),
        )
    )
