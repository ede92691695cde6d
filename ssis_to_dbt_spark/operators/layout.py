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


def file_rectangles(files: list[str], col_x: str, col_y: str) -> list[dict]:
    """Per-file min/max rectangles for two columns, read from the parquet
    FOOTERS only (pyarrow metadata — no data pages touched).  A file missing
    stats for either column gets an unbounded rectangle (never pruned
    blind).  This is the stand-in for the stats manifest a table format
    (Delta/Iceberg) persists at write time; footer probing is O(files)
    metadata reads and can itself be distributed when the file count is
    large — at 100 TB you persist the manifest once and consult it, which
    is exactly what this list is."""
    import pyarrow.parquet as pq

    rects = []
    for f in files:
        local = f[7:] if f.startswith("file://") else f
        md = pq.ParquetFile(local).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        bounds: dict[str, tuple] = {}
        ok = True
        for col in (col_x, col_y):
            if col not in names:
                ok = False
                break
            idx = names.index(col)
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if lo is None:
                ok = False
                break
            bounds[col] = (lo, hi)
        rects.append(
            {
                "file": f,
                "x": bounds.get(col_x) if ok else None,
                "y": bounds.get(col_y) if ok else None,
            }
        )
    return rects


def zorder_prune_files(
    spark,
    path: str,
    col_x: str,
    col_y: str,
    x_range: tuple | None = None,
    y_range: tuple | None = None,
) -> tuple[list[str], int]:
    """Select the files of a Z-ordered parquet layout whose footer-stats
    rectangle intersects the query rectangle.  Ranges are inclusive
    ``(lo, hi)``; ``None`` bounds are unbounded.  Returns
    ``(kept_files, total_files)``.  File listing comes from Spark's own
    file index (``inputFiles`` — metadata only, storage-agnostic)."""
    files = list(spark.read.parquet(path).inputFiles())

    def overlaps(stat: tuple | None, rng: tuple | None) -> bool:
        if stat is None or rng is None:
            return True  # no stats -> cannot prune; no predicate -> keep
        lo, hi = rng
        return (lo is None or stat[1] >= lo) and (hi is None or stat[0] <= hi)

    kept = [
        r["file"]
        for r in file_rectangles(files, col_x, col_y)
        if overlaps(r["x"], x_range) and overlaps(r["y"], y_range)
    ]
    return kept, len(files)


def zorder_scan(
    spark,
    path: str,
    col_x: str,
    col_y: str,
    x_range: tuple | None = None,
    y_range: tuple | None = None,
) -> DataFrame:
    """Read a Z-ordered parquet layout with FILE-level pruning on a 2-D
    range predicate: only files whose min/max rectangle intersects the
    query rectangle enter the scan, then the exact predicate is re-applied
    as a normal pushed filter (correctness never depends on the pruning —
    it only shrinks the file list the way a Delta/Iceberg reader consults
    its stats manifest).  On a layout from :func:`zorder_write`, files
    cover narrow rectangles in BOTH dimensions, so a selective 2-D
    predicate reads a small fraction of the files — the measurable payoff
    of the Morton re-clustering."""
    kept, total = zorder_prune_files(spark, path, col_x, col_y, x_range, y_range)
    if not kept:
        # empty result with the layout's schema (predicate excluded all files)
        return spark.read.parquet(path).limit(0)
    df = spark.read.parquet(*kept)

    def rng_filter(col: str, rng: tuple | None):
        conds = []
        if rng is not None:
            lo, hi = rng
            if lo is not None:
                conds.append(F.col(col) >= F.lit(lo))
            if hi is not None:
                conds.append(F.col(col) <= F.lit(hi))
        return conds

    for cond in rng_filter(col_x, x_range) + rng_filter(col_y, y_range):
        df = df.filter(cond)
    return df


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
