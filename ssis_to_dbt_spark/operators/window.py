"""General window-function operators: ranking, offsets, running & moving
aggregates.

The reference's generated dbt SQL leans on window functions for SCD2
versioning (``row_number``/``lead`` — ``dbt_project/models/core/
dim_customer.sql:28-81``); this module exposes the rest of the family so
migrated models that rank, compare to a prior row, or accumulate running
measures stay declarative and compile to a single Window exchange.

100 TB shape: each helper is ONE hash-partition exchange on
``partition_by`` plus an in-partition sort — Catalyst collapses multiple
window expressions over the SAME (partition, order) spec into a single
Window physical node, so composing these helpers with one spec adds no
extra shuffles.  The only scale hazard is a skewed partition key (one
customer with a billion rows serializes its partition); pathological keys
should be pre-split upstream (see ``operators/skew.py``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

_RANKERS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
}


def window_spec(
    partition_by: Sequence[str | Column], order_by: Sequence[str | Column]
) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def ranked(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    method: str = "row_number",
    out_col: str = "rn",
) -> DataFrame:
    """Add a ranking column (``row_number`` | ``rank`` | ``dense_rank``).

    ``order_by`` should totally order each partition (add a unique tiebreak
    key) when the rank feeds deterministic downstream logic.
    """
    if method not in _RANKERS:
        raise ValueError(f"unknown rank method {method!r}; use {sorted(_RANKERS)}")
    return df.withColumn(
        out_col, _RANKERS[method]().over(window_spec(partition_by, order_by))
    )


def offset_compare(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    value_col: str | Column,
    out_col: str = "prev_value",
    offset: int = 1,
    lead: bool = False,
) -> DataFrame:
    """Attach ``lag`` (default) or ``lead`` of ``value_col`` — the prior/next
    row's value within the partition; NULL at partition edges."""
    fn = F.lead if lead else F.lag
    return df.withColumn(
        out_col, fn(value_col, offset).over(window_spec(partition_by, order_by))
    )


def running_aggregate(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    value_col: str | Column,
    out_col: str = "running_sum",
    agg=F.sum,
) -> DataFrame:
    """Cumulative aggregate over ROWS UNBOUNDED PRECEDING..CURRENT ROW.

    The frame is ROWS (not the RANGE default) so peer rows — duplicates in
    ``order_by`` — accumulate one at a time; pair with a unique tiebreak in
    ``order_by`` for fully deterministic output.  Cast measures to DECIMAL
    first when exact accumulation matters (double running sums are
    order-dependent in the last ulp).
    """
    w = window_spec(partition_by, order_by).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(out_col, agg(value_col).over(w))


def moving_aggregate(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    value_col: str | Column,
    window_rows: int,
    out_col: str = "moving_agg",
    agg=F.sum,
) -> DataFrame:
    """Trailing-window aggregate over the last ``window_rows`` rows
    (ROWS ``window_rows - 1`` PRECEDING..CURRENT ROW)."""
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    w = window_spec(partition_by, order_by).rowsBetween(
        -(window_rows - 1), Window.currentRow
    )
    return df.withColumn(out_col, agg(value_col).over(w))


def range_aggregate(
    df: DataFrame,
    partition_by: Sequence[str],
    order_numeric: str | Column,
    value_col: str | Column,
    preceding: int,
    out_col: str = "range_agg",
    agg=F.sum,
) -> DataFrame:
    """Value-based trailing-window aggregate (RANGE ``preceding``
    PRECEDING..CURRENT ROW over a numeric ordering column).

    Unlike :func:`moving_aggregate` (ROWS frame = physical row offsets), a
    RANGE frame bounds the window by the *value* of ``order_numeric`` — e.g.
    a rolling 7-day revenue uses a day-index order column with
    ``preceding=6``, and days with no rows simply contribute nothing.  Peer
    rows (equal order values) always share one frame, so the result is
    deterministic without a tiebreak key.  Same 100 TB shape as the rest of
    the module: one hash exchange on ``partition_by`` + in-partition sort.
    """
    if preceding < 0:
        raise ValueError("preceding must be >= 0")
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(order_numeric)
        .rangeBetween(-preceding, Window.currentRow)
    )
    return df.withColumn(out_col, agg(value_col).over(w))


def ntile_buckets(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[str | Column],
    n: int,
    out_col: str = "bucket",
) -> DataFrame:
    """Equal-frequency bucketing (``ntile(n)``) within each partition."""
    return df.withColumn(
        out_col, F.ntile(n).over(window_spec(partition_by, order_by))
    )


def fill_forward(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    cols: Sequence[str],
) -> DataFrame:
    """Last-observation-carried-forward per key: each NULL in ``cols`` takes
    the latest preceding non-null value in ``ts_col`` order.  One shuffle on
    ``keys`` (the unbounded-preceding frame runs per key, never globally) —
    the standard time-series LOCF primitive."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def time_grid(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Per-key dense timestamp grid from the key's first to last observed
    bucket: one tiny min/max aggregate per key, then a map-side
    ``sequence`` explode — grid size is (span / step) rows per key, never a
    function of the observation count."""
    spans = df.groupBy(*keys).agg(
        F.min(ts_col).alias("_t0"), F.max(ts_col).alias("_t1")
    )
    return spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("_t0"), F.col("_t1"), F.expr(f"INTERVAL {step}"))
        ).alias(ts_col),
    )


def gap_fill(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    fill_cols: Sequence[str],
    step: str = "1 hour",
    gap_col: str = "is_gap",
) -> DataFrame:
    """Regularize a sparse per-key time series: left-join the observations
    onto the dense :func:`time_grid` and carry ``fill_cols`` forward with
    :func:`fill_forward`.  Grid buckets with no observation get
    ``gap_col=1``.  Shape: one small span aggregate + a key/bucket
    equi-join + one window shuffle on ``keys`` — linear in grid size."""
    grid = time_grid(df, keys, ts_col, step)
    joined = grid.join(df, [*keys, ts_col], "left")
    marked = joined.withColumn(
        gap_col,
        F.when(F.col(fill_cols[0]).isNull(), F.lit(1)).otherwise(F.lit(0)),
    )
    return fill_forward(marked, keys, ts_col, fill_cols)


def merge_intervals(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Gaps-and-islands interval merging: coalesce overlapping/touching
    ``[start, end]`` intervals per key into maximal islands — busy periods,
    downtime windows, coverage spans.

    Classic single-window formulation: an interval starts a new island when
    its start exceeds the running max end of everything before it; the
    island id is the running sum of those break flags.  ONE shuffle on the
    key (both windows and the final groupBy share the partitioning —
    Catalyst collapses them onto one exchange).  Touching intervals
    (``start == prev_end``) merge; strictly-after starts break.
    Returns (keys..., island_start, island_end, n_intervals)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(*key_cols).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = (
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end)
    ).cast("int")
    island = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_island", island)
        .groupBy(*key_cols, "_island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("_island")
    )


def time_decay_score(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str,
    depth: int = 16,
    value_scale: int = 4,
) -> DataFrame:
    """Exact-integer time-decayed activity score (the feature-store EWMA):
    per key, the newest event counts in full and each older event counts
    half as much, truncated at ``depth`` events back — ``score = sum_{j<depth}
    v_{newest-j} * 2^-j``.

    Determinism discipline: values are quantized through DECIMAL(18,
    ``value_scale``) into integer units, and the truncated closed form is
    rescaled by ``2^(depth-1)`` so every term is an exact BIGINT —
    ``score_units = sum v_units[j] << (depth-1-j)``, order-independent and
    engine-portable (the surprisal/entropy units pattern; real score =
    score_units / (10^scale * 2^(depth-1))).  An untruncated recurrence
    would force a sequential IEEE fold no SQL oracle could reorder safely.

    Plan shape: ONE window shuffle on the key; the ``row_number <= depth``
    filter is a WindowGroupLimit, so each map task pre-trims to depth rows
    per key before the shuffle — per-key state is bounded at any corpus
    size and hot keys cannot blow up a partition.  Returns one row per key:
    ``(*key_cols, score_units, n_events, last_<order_cols[0]>)``.

    Range guard: under Spark's non-ANSI semantics a value outside
    DECIMAL(18, ``value_scale``) would cast to NULL and silently contribute
    nothing (where the DuckDB oracle errors), and ``v_units << (depth-1)``
    can overflow BIGINT silently.  Both are rejected loudly instead: any
    non-NULL value whose quantized magnitude exceeds ``2^(62-depth)`` units
    (which also covers the decimal-overflow NULL) raises at execution time,
    so the shifted sum provably fits BIGINT (``|v_units| * (2^depth - 1)
    <= 2^62``).  NULL input values still contribute nothing, matching SQL
    SUM semantics.
    """
    if depth < 1 or depth > 62:
        raise ValueError("depth must be in [1, 62] to keep shifts in BIGINT")
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.desc(c) for c in order_cols]
    )
    raw_units = (
        F.col(value_col).try_cast(f"decimal(18,{value_scale})")
        * (10 ** value_scale)
    ).try_cast("long")
    unit_bound = 1 << (62 - depth)
    v_units = F.when(
        F.col(value_col).isNotNull()
        & (raw_units.isNull() | (F.abs(raw_units) > F.lit(unit_bound))),
        F.raise_error(
            F.format_string(
                "time_decay_score: value %s exceeds the exact-BIGINT range "
                f"for depth={depth}, value_scale={value_scale} "
                f"(|units| must be <= 2^{62 - depth})",
                F.col(value_col).cast("string"),
            )
        ).cast("long"),
    ).otherwise(raw_units)
    ranked_df = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= depth)
        .select(
            *key_cols,
            *order_cols,
            v_units.alias("_vu"),
            F.col("_rn"),
        )
    )
    # F.shiftleft only takes a literal bit count; the per-row shift needs expr
    term = F.col("_vu") * F.expr(
        f"shiftleft(CAST(1 AS BIGINT), {depth} - _rn)"
    )
    return ranked_df.groupBy(*key_cols).agg(
        F.sum(term).alias("score_units"),
        F.count(F.lit(1)).cast("int").alias("n_events"),
        F.max(F.col(order_cols[0])).alias(f"last_{order_cols[0]}"),
    )


def distributed_global_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    rank_col: str = "_rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global rank by ``order_cols`` WITHOUT a
    single-partition window — the 100 TB replacement for
    ``row_number().over(Window.orderBy(...))`` (which funnels the whole
    relation through one task).

    Shape: ``repartitionByRange`` on the order columns (Spark's
    distributed sort partitioning — between-partition order is total when
    the key is, and ties stay co-partitioned), ``localCheckpoint`` to pin
    the partition layout, then rank = (sum of earlier partitions' sizes)
    + bucket-local ``row_number``.  Partition sizes are a
    ``num_partitions``-row collect (model-sized); the per-bucket window
    sorts only its own range slice.  Output is EXACT and deterministic
    for a total-order key — independent of the sampled range boundaries,
    which only move rows between buckets, never change the global order.

    ``order_cols`` must form a total order (append a unique id as the
    last column — same contract as any deterministic ranking)."""
    np_ = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    cols = [F.col(c) for c in order_cols]
    part = df.repartitionByRange(np_, *cols).localCheckpoint()
    with_pid = part.withColumn("_pid", F.spark_partition_id())
    sizes = {
        r["_pid"]: r["n"]
        for r in with_pid.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    return (
        with_pid.withColumn(
            rank_col,
            (
                off[F.col("_pid")].cast("long")
                + F.row_number().over(w).cast("long")
            ),
        )
        .drop("_pid")
    )
