"""Skew-handling operators for 100 TB-scale joins and aggregations.

A shuffled join or aggregation is only as fast as its largest key.  Spark's
AQE skew-join splitting (enabled in session.py) handles sort-merge joins at
runtime; these operators cover the cases AQE cannot:

- ``salted_aggregate``: two-phase aggregation for heavily skewed GROUP BY
  keys.  Phase 1 aggregates on (key, salt) — the hot key's rows spread over
  ``salt_buckets`` reducers — phase 2 merges the per-salt partials.  Works for
  any algebraic aggregate (sum/count/min/max); the caller supplies both the
  partial and the merge expression.
- ``salted_join``: fact-side salt + dimension-side explode for a skewed
  equi-join where the dimension is too big to broadcast.  Each fact row gets
  a DETERMINISTIC salt (hash of the whole row's join-independent columns is
  unnecessary — a per-row spread via xxhash64 on a unique column is enough);
  the dimension replicates ``salt_buckets``× so every (key, salt) pair finds
  its match.  Replication cost: dim_size × salt_buckets — use only on the few
  known-hot keys via ``hot_keys`` when the dimension is large.

Both are deterministic (no ``rand()``) so retried tasks and re-runs produce
identical results — a correctness requirement under speculative execution.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(col: Column, buckets: int) -> Column:
    """Deterministic salt in [0, buckets): xxhash64 spread of a unique-ish
    column (no rand() — speculative-execution safe)."""
    return F.pmod(F.xxhash64(col), F.lit(buckets)).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    salt_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partial_aggs``: name -> aggregate over the raw rows (phase 1, grouped on
    keys + salt).  ``merge_aggs``: name -> aggregate over the phase-1 partials
    (grouped on keys alone).  Example::

        salted_aggregate(
            df, ["k"],
            partial_aggs={"s": F.sum("v"), "c": F.count(F.lit(1))},
            merge_aggs={"s": F.sum("s"), "c": F.sum("c")},
            salt_col="unique_id",
        )
    """
    phase1 = (
        df.withColumn("_salt", _salt(F.col(salt_col), salt_buckets))
        .groupBy(*keys, "_salt")
        .agg(*[c.alias(n) for n, c in partial_aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(n) for n, c in merge_aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_col: str,
    salt_buckets: int = 16,
    how: str = "left",
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Skew-safe equi-join: salt the fact, explode the dimension.

    With ``hot_keys`` (a small DataFrame of the skewed join-key values), only
    hot-key rows are salted/replicated; the cold remainder joins normally and
    the two results union — dimension replication cost stays bounded by
    ``|hot dim rows| * salt_buckets``.
    """
    salt_values = F.array(*[F.lit(i) for i in range(salt_buckets)])

    def add_fact_salt(df: DataFrame) -> DataFrame:
        return df.withColumn("_salt", _salt(F.col(salt_col), salt_buckets))

    def explode_dim(df: DataFrame) -> DataFrame:
        return df.withColumn("_salt", F.explode(salt_values))

    if hot_keys is None:
        joined = add_fact_salt(fact).join(
            explode_dim(dim), on=on + ["_salt"], how=how
        )
        return joined.drop("_salt")

    hot = F.broadcast(hot_keys.select(*on).distinct())
    fact_hot = fact.join(hot, on=on, how="left_semi")
    fact_cold = fact.join(hot, on=on, how="left_anti")
    dim_hot = dim.join(hot, on=on, how="left_semi")
    dim_cold = dim.join(hot, on=on, how="left_anti")

    hot_joined = add_fact_salt(fact_hot).join(
        explode_dim(dim_hot), on=on + ["_salt"], how=how
    ).drop("_salt")
    cold_joined = fact_cold.join(dim_cold, on=on, how=how)
    return hot_joined.unionByName(cold_joined)


def detect_hot_keys(
    fact: DataFrame,
    on: list[str],
    skew_factor: float = 8.0,
    min_count: int = 1000,
    sample_fraction: float | None = None,
    max_keys: int = 100,
) -> DataFrame:
    """Key values whose row count exceeds ``max(min_count, skew_factor *
    mean_count)`` — the inputs that make a shuffled join stall on one
    reducer.  One aggregation over the fact (or a sample: at 100 TB pass
    ``sample_fraction`` — only the RANKING matters, and thresholds scale by
    the fraction), a 1-row mean collect, and a ``max_keys``-bounded top-k.
    Empty result = no skew."""
    src = fact.select(*on)
    scale = 1.0
    if sample_fraction is not None:
        src = src.sample(fraction=sample_fraction, seed=7)
        scale = sample_fraction
    counts = src.groupBy(*on).agg(F.count(F.lit(1)).alias("_cnt"))
    mean = counts.agg(F.avg("_cnt").alias("_m")).first()["_m"]
    if mean is None:
        return counts.select(*on).limit(0)
    threshold = max(min_count * scale, skew_factor * float(mean))
    return (
        counts.filter(F.col("_cnt") >= F.lit(threshold))
        .orderBy(F.desc("_cnt"))
        .limit(max_keys)
        .select(*on)
    )


def auto_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    salt_col: str,
    salt_buckets: int = 16,
    how: str = "left",
    skew_factor: float = 8.0,
    min_count: int = 1000,
    sample_fraction: float | None = None,
) -> tuple[DataFrame, str]:
    """Route a shuffled equi-join by measured skew: when
    :func:`detect_hot_keys` finds keys over the threshold, the join runs as
    the hot-key-split :func:`salted_join` (hot keys salt+replicate, the cold
    remainder joins normally); otherwise it is a plain join and pays
    nothing.  Returns ``(joined, route)`` with route ``"salted"`` or
    ``"plain"`` so callers/ops can assert which path engaged.

    The detection pass is one counting aggregation (sampled at scale) and a
    driver-side materialization of at most ``max_keys`` hot keys — the same
    cost profile as a broadcast-threshold decision, run before the big
    shuffle it protects."""
    hot = detect_hot_keys(
        fact, on, skew_factor, min_count, sample_fraction
    ).cache()
    try:
        engaged = hot.limit(1).count() > 0
        if not engaged:
            return fact.join(dim, on=on, how=how), "plain"
        # materialize the (<= max_keys)-row hot set so the routed plan
        # broadcasts a literal key list, not a re-computed aggregation
        hot_rows = hot.collect()
    finally:
        hot.unpersist()
    hot_df = fact.sparkSession.createDataFrame(hot_rows, hot.schema)
    return (
        salted_join(
            fact, dim, on, salt_col, salt_buckets, how, hot_keys=hot_df
        ),
        "salted",
    )


def top_keys(df: DataFrame, keys: list[str], n: int = 100) -> DataFrame:
    """Find the ``n`` heaviest key values — the input for ``hot_keys``.
    One aggregation + TakeOrderedAndProject; run it on a sample for huge
    inputs (``df.sample(0.01)``) since only the ranking matters."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .orderBy(F.desc("_cnt"))
        .limit(n)
        .drop("_cnt")
    )
