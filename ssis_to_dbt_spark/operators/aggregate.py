"""Aggregation operators (SURVEY §2.5 A1-A10, §2.7 O2).

Reference semantics: the SSIS Aggregate component maps to GROUP BY
(/root/reference/src/parser/constants.py:31); the generated models use 3-key
hash aggregates with SUM/SUM/COUNT (agg_daily_sales.sql:56-68), guarded
post-agg measures (:91-95), scalar validation counts
(src/connections/sql_server.py:156-164), FLOAT checksums (:194-199),
HAVING COUNT(*)>1 duplicate detection (:237-245), MAX watermarks
(src/agents/builder.py:322-326), and TOP 1 ... ORDER BY DESC
(InventorySync.dtsx:58-62).

Spark-first notes for 100 TB: ``groupBy().agg()`` gets map-side partial
aggregation automatically (HashAggregate -> shuffle on group keys ->
HashAggregate), so the shuffle carries one row per (partition, key) — the
right shape at any scale.  Scalar aggregates reduce to a single row without
collecting data.  ``top_k_latest`` uses ``orderBy().limit(k)`` which Spark
executes as TakeOrderedAndProject: a per-partition top-k then a k-row merge
on the driver — never a full sort of the table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def grouped_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    post: dict[str, Column] | None = None,
    ci: bool = False,
) -> DataFrame:
    """A1/A2: hash aggregate; ``post`` adds derived measures (A3) computed on
    the aggregated (small) result.

    ``ci=True`` (r12, r11 VERDICT #4): SQL Server default-collation
    (``SQL_Latin1_General_CP1_CI_AS``) GROUP BY semantics on STRING keys
    — values differing only by case land in ONE group (a mixed-case
    migration otherwise produces MORE groups than the source server;
    the reference groups on string keys in e.g.
    ``dbt_project/models/core/dim_customer.sql``).  Each folded group's
    displayed key is the MIN of the original-case values: SQL Server
    surfaces an arbitrary first-seen representative, which no
    distributed engine can reproduce deterministically — MIN is the
    portable, oracle-matchable choice.  Non-string keys pass through
    (collation only affects character data).  Aggregate expressions
    that reference a string KEY column see its lower() fold.

    100 TB shape is unchanged: still one hash agg with map-side partial
    combine; the fold is a map-side projection and the MIN
    representative rides the same combine."""
    if ci:
        from .lookup import _ci_fold

        df, stash = _ci_fold(df, keys)
        rep = [F.min(s).alias(f"__rep_{k}") for k, s in stash.items()]
        out = df.groupBy(*keys).agg(
            *[c.alias(n) for n, c in aggs.items()], *rep
        )
        for k in stash:
            out = out.withColumn(k, F.col(f"__rep_{k}")).drop(f"__rep_{k}")
        out = out.select(*keys, *aggs)
    else:
        out = df.groupBy(*keys).agg(*[c.alias(n) for n, c in aggs.items()])
    for name, col in (post or {}).items():
        out = out.withColumn(name, col)
    return out


def scalar_aggregate(df: DataFrame, aggs: dict[str, Column]) -> DataFrame:
    """A4: scalar aggregates (validation counts) — one-row DataFrame."""
    return df.agg(*[c.alias(n) for n, c in aggs.items()])


def checksum_aggregates(df: DataFrame, numeric_cols: list[str]) -> DataFrame:
    """A5: per-column SUM/AVG over FLOAT casts, NULL->0
    (sql_server.py:194-199, validator.py:379-387)."""
    aggs = []
    for c in numeric_cols:
        aggs.append(
            F.coalesce(F.sum(F.col(c).cast("double")), F.lit(0.0)).alias(f"sum_{c}")
        )
        aggs.append(
            F.coalesce(F.avg(F.col(c).cast("double")), F.lit(0.0)).alias(f"avg_{c}")
        )
    return df.agg(*aggs)


def merge_aggregate(
    existing: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str] = (),
    min_cols: list[str] = (),
    max_cols: list[str] = (),
) -> DataFrame:
    """Incremental rollup maintenance: merge a same-schema delta aggregate
    into an existing aggregate table by re-aggregating their union —
    SUM-of-SUMs (counts are sums too), MIN-of-MINs and MAX-of-MAXs are
    exact for algebraic aggregates; AVG derives as sum/count downstream.

    This is the 100 TB pattern for keeping a daily rollup current: the
    nightly delta aggregates only the new partition (linear in NEW bytes),
    and the merge shuffles two aggregate tables — O(distinct keys), never
    the fact history.  With decimal sums the merged values are bit-identical
    to a full recompute at any partitioning, which is exactly what the
    catalog query's oracle asserts.  Aggregate columns keep their
    ``existing`` dtypes (Spark widens decimal sums; they are cast back).
    """
    types = {f.name: f.dataType for f in existing.schema.fields}
    merged = existing.unionByName(delta)
    aggs = (
        [F.sum(c).cast(types[c]).alias(c) for c in sum_cols]
        + [F.min(c).cast(types[c]).alias(c) for c in min_cols]
        + [F.max(c).cast(types[c]).alias(c) for c in max_cols]
    )
    return merged.groupBy(*keys).agg(*aggs)


def duplicate_keys(
    df: DataFrame, keys: list[str], ci: bool = False
) -> DataFrame:
    """A7: GROUP BY pk HAVING COUNT(*) > 1 (sql_server.py:237-245).

    ``ci=True``: CI-collation duplicate detection — keys differing only
    by case COUNT AS DUPLICATES, exactly as a unique index on a CI
    column would reject them on the source server.  The reported key is
    the MIN-case representative (see :func:`grouped_aggregate`)."""
    return grouped_aggregate(
        df.select(*keys),
        keys,
        {"dup_count": F.count(F.lit(1))},
        ci=ci,
    ).filter(F.col("dup_count") > 1)


def row_count(df: DataFrame, alias: str = "row_cnt") -> DataFrame:
    """A10: RowCount component -> one-row count frame (the package-variable
    binding happens driver-side via .first())."""
    return df.agg(F.count(F.lit(1)).alias(alias))


def top_k_latest(
    df: DataFrame, order_by: list[Column], k: int = 1
) -> DataFrame:
    """O2/O3: SELECT TOP k ... ORDER BY ... DESC. Pass fully-deterministic
    sort keys (include a unique tiebreaker) so results are stable."""
    return df.orderBy(*order_by).limit(k)


def rollup_aggregate(
    df: DataFrame, levels: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """Hypertable-style multi-granularity rollup: one pass emits the
    aggregate at every prefix granularity of ``levels`` (e.g. [day, hour] ->
    per-hour, per-day, and grand-total rows) plus ``grouping_level`` (the
    GROUPING_ID bitmask) to tell the grains apart.  Spark's partial
    aggregation computes all grains map-side in the same single shuffle a
    plain GROUP BY would use — strictly cheaper than materializing each
    grain with its own scan, which is what a continuous-aggregate table
    per grain costs."""
    return df.rollup(*levels).agg(
        F.grouping_id().cast("int").alias("grouping_level"),
        *[c.alias(n) for n, c in aggs.items()],
    )


def cube_aggregate(
    df: DataFrame, dims: list[str], aggs: dict[str, Column]
) -> DataFrame:
    """Full-cube aggregation: one pass emits every subset combination of
    ``dims`` (2^n grains) with the GROUPING_ID bitmask — the OLAP
    cross-tab companion of :func:`rollup_aggregate`'s prefix grains.  Same
    scale shape: all grains share one shuffle via map-side partial
    aggregation; output size is the sum of the grains' cardinalities, so
    keep ``dims`` low-cardinality at 100 TB."""
    return df.cube(*dims).agg(
        F.grouping_id().cast("int").alias("grouping_level"),
        *[c.alias(n) for n, c in aggs.items()],
    )


def kmv_distinct(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """K-minimum-values distinct-count sketch: keep the ``k`` smallest
    DISTINCT md5 values of ``col``; the k-th smallest, read as a fraction of
    the hash space, estimates the cardinality as ``(k-1) / fraction``
    (Bar-Yossef et al., the mergeable-sketch classic).  Content-addressed
    (md5, never rand), so the estimate is deterministic and cross-engine
    reproducible — unlike HLL-based approx_count_distinct, whose register
    layout is engine-private.  When fewer than ``k`` distinct values exist,
    the sketch IS the exact count and returns it.

    Plan shape: distinct on the 32-char hash, then TakeOrdered(k) — the only
    full-width shuffle is the distinct, whose payload is the hash alone.
    Returns one row: (kmv_k, kmv_estimate)."""
    h = df.select(F.md5(F.col(col).cast("string")).alias("_h")).distinct()
    return _kmv_estimate_from_hashes(h, k)


def _kmv_estimate_from_hashes(h: DataFrame, k: int) -> DataFrame:
    """Shared KMV tail: given a frame of distinct hash strings ``_h``, keep
    the k smallest and turn the k-th into a cardinality estimate."""
    kth = (
        h.orderBy("_h")
        .limit(k)
        .agg(F.max("_h").alias("_hk"), F.count(F.lit(1)).alias("kmv_k"))
    )
    frac = F.conv(F.substring("_hk", 1, 15), 16, 10).cast("double") / F.lit(
        float(1 << 60)
    )
    est = F.when(
        F.col("kmv_k") < k, F.col("kmv_k").cast("double")
    ).otherwise(F.lit(float(k - 1)) / frac)
    return kth.select("kmv_k", F.round(est, 6).alias("kmv_estimate"))


def kmv_sketch_grouped(
    df: DataFrame, group_cols: list[str], col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV sketch: for each group, the (up to) ``k`` smallest
    distinct md5 values of ``col`` as a sorted array — the mergeable form
    of the sketch.  At 100 TB this is the map-side pattern: sketch each
    partition/day/group independently, persist the tiny arrays, and merge
    downstream (``kmv_merge_estimate``) without touching raw data again.

    Plan shape: distinct on (group, hash) then one window per group keeping
    k rows — state per group is bounded by k."""
    from pyspark.sql import Window

    h = df.select(
        *group_cols, F.md5(F.col(col).cast("string")).alias("_h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    return (
        h.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("_h")).alias("kmv_sketch"))
    )


def kmv_merge_estimate(
    sketches: DataFrame, sketch_col: str = "kmv_sketch", k: int = 64
) -> DataFrame:
    """Merge per-group KMV sketches into one union-cardinality estimate.

    KMV merging is LOSSLESS for the union: any hash among the k smallest of
    the union is among the k smallest of its own group's sketch, so the
    merged k-min set — and therefore the estimate — is bit-identical to
    sketching the union directly (the property the driver oracle verifies).

    Constraint: ``k`` must NOT exceed the ``k`` the sketches were BUILT
    with.  Built-k cannot be recovered from the data (a short sketch may
    just mean a small group), so a larger merge-k silently under-estimates:
    the union's (built_k+1)-th..k-th smallest hashes were truncated away.
    Merging with a smaller k than built is always valid (re-truncation)."""
    h = sketches.select(
        F.explode(sketch_col).alias("_h")
    ).distinct()
    return _kmv_estimate_from_hashes(h, k)


def histogram_sketch_grouped(
    df: DataFrame, group_cols: list[str], col: str, bin_width: float
) -> DataFrame:
    """Fixed-width histogram sketch per group: ``bin = floor(col/width)`` →
    count.  The deterministic, mergeable quantile path for 100 TB — one
    map-side combinable aggregation; per-group state is the (bounded) bin
    count, and merging sketches is a plain count sum (lossless, unlike
    t-digest whose centroids depend on merge order)."""
    if not bin_width > 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    b = F.floor(F.col(col) / F.lit(float(bin_width))).cast("long")
    return df.groupBy(*group_cols, b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n")
    )


def cms_sketch(
    df: DataFrame, col: str, depth: int = 3, width: int = 256
) -> DataFrame:
    """Count-min sketch build (Cormode & Muthukrishnan 2005): for each of
    ``depth`` independent md5-derived hash rows, count values per bucket.
    Returns ``(cms_row, bucket, n)`` — at most depth*width rows regardless
    of input size.  The frequency sketch completes the mergeable-sketch
    family (KMV = distincts, histogram = quantiles, CMS = point
    frequencies); two shards' sketches merge by summing ``n`` bucket-wise
    (:func:`cms_merge`), losslessly.

    Scale shape: one projection + one explode (depth entries per value) +
    one aggregation whose state is bounded by depth*width — the shuffle
    carries at most depth*width rows per map partition.  md5 bucketing
    (never xxhash/rand) keeps the sketch bit-reproducible by an external
    SQL engine.
    """
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("cms_row"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    ":",
                                    F.lit(str(i)),
                                    F.col(col).cast("string"),
                                )
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.lit(int(width))
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    flat = df.select(F.explode(entries).alias("_e")).select(
        F.col("_e.cms_row").alias("cms_row"), F.col("_e.bucket").alias("bucket")
    )
    return flat.groupBy("cms_row", "bucket").agg(F.count(F.lit(1)).alias("n"))


def hll_registers(df: DataFrame, col: str, b: int = 10) -> DataFrame:
    """HyperLogLog register build (Flajolet et al. 2007): per-bucket max of
    the leading-zero rank of an md5-derived hash.  Content-addressed (md5 of
    the value, never engine-private hashing), so the register table —
    ``(bucket, rho_max)``, at most ``2**b`` rows — is deterministic and
    cross-engine reproducible, unlike ``approx_count_distinct`` whose HLL++
    layout is Spark-internal.

    Bit layout: the first 4 hex chars (16 bits) select the bucket (low ``b``
    bits); the next 15 hex chars (60 bits) feed the rank, computed from the
    hex string itself — leading ``0`` chars count 4 zero-bits each, the
    first non-zero nibble adds its own leading zeros via a 3-way CASE — so
    no engine-specific bit intrinsics are needed and the DuckDB oracle can
    reproduce every register exactly.

    Scale shape: one narrow projection + one map-side-combinable groupBy
    whose state is bounded by ``2**b`` — the canonical 100 TB distinct-count
    pattern (sketch shards, persist tiny registers, merge downstream with
    :func:`hll_merge` losslessly).  Completes the mergeable-sketch family:
    KMV (distincts, exact-small), HLL (distincts, fixed memory), CMS (point
    frequencies), histogram (quantiles)."""
    if not 1 <= b <= 16:
        raise ValueError(f"b must be in [1, 16], got {b}")
    m = 1 << b
    h = F.md5(F.col(col).cast("string"))
    bucket = F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % m
    rest = F.substring(h, 5, 15)
    z = F.length(F.regexp_extract(rest, "^(0*)", 1))
    nib = rest.substr(z + F.lit(1), F.lit(1))
    nlz = (
        F.when(nib == "1", 3)
        .when(nib.isin("2", "3"), 2)
        .when(nib.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rho = F.when(z == 15, F.lit(61)).otherwise(z * 4 + nlz + 1)
    return (
        df.select(bucket.alias("bucket"), rho.alias("_rho"))
        .groupBy("bucket")
        .agg(F.max("_rho").cast("int").alias("rho_max"))
    )


def hll_merge(registers: DataFrame) -> DataFrame:
    """Merge HLL register tables built over shards: bucket-wise MAX —
    exactly equal to sketching the union directly (lossless, order-free),
    the property the driver suite verifies bit-for-bit."""
    return registers.groupBy("bucket").agg(
        F.max("rho_max").cast("int").alias("rho_max")
    )


def hll_estimate(registers: DataFrame, b: int = 10) -> DataFrame:
    """Cardinality estimate from an HLL register table: bias-corrected
    harmonic mean with the small-range linear-counting correction.  The
    float math (pow/ln sums) is NOT bit-portable across engines, so the
    oracle surface is the register table itself; this estimator is verified
    in pytest against exact counts within HLL's ~1.04/sqrt(m) error."""
    m = 1 << b
    alpha = 0.7213 / (1 + 1.079 / m)
    agg = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho_max"))).alias("_s"),
        F.count(F.lit(1)).alias("_present"),
    )
    zeros = F.lit(m) - F.col("_present")  # absent buckets are zero registers
    # SUM over an empty register table is NULL: coalesce to 0 so the empty
    # sketch flows into linear counting and estimates exactly 0
    s = F.coalesce(F.col("_s"), F.lit(0.0))
    raw = F.lit(alpha * m * m) / (s + zeros.cast("double"))
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zeros),
    ).otherwise(raw)
    return agg.select(
        F.round(est, 6).alias("hll_estimate"), zeros.cast("long").alias("hll_zeros")
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built over disjoint shards: a plain count
    sum per (cms_row, bucket) — exactly equal to sketching the union."""
    return sketches.groupBy("cms_row", "bucket").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates from a count-min sketch: for each probe
    value, the MIN over hash rows of its bucket count (an absent bucket
    counts 0).  CMS guarantees estimate >= true frequency; the probe side
    is tiny, so the sketch join broadcasts."""
    entries = F.array(
        *[
            F.struct(
                F.lit(i).alias("cms_row"),
                (
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat_ws(
                                    ":",
                                    F.lit(str(i)),
                                    F.col(col).cast("string"),
                                )
                            ),
                            1,
                            15,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % F.lit(int(width))
                ).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    probe_rows = probes.select(
        F.col(col), F.explode(entries).alias("_e")
    ).select(
        col, F.col("_e.cms_row").alias("cms_row"), F.col("_e.bucket").alias("bucket")
    )
    joined = probe_rows.join(sketch, ["cms_row", "bucket"], "left").select(
        col, F.coalesce(F.col("n"), F.lit(0)).alias("_n")
    )
    return joined.groupBy(col).agg(F.min("_n").alias("cms_est"))


def histogram_merge(h: DataFrame) -> DataFrame:
    """Merge per-group histogram sketches into one global histogram — a
    count sum per bin, exactly equal to histogramming the union directly."""
    return h.groupBy("bin").agg(F.sum("n").alias("n"))


def histogram_quantile(
    h: DataFrame, q: float, bin_width: float
) -> DataFrame:
    """Quantile estimate from a histogram: the lower bound of the first bin
    whose cumulative count reaches ``ceil(q * total)``.  Deterministic
    integer logic — both the rank target and the cumulative sums are exact
    counts.  The cumulative window runs over the BIN relation (bounded
    cardinality, already aggregated), so the single-partition sort is over
    dozens of rows, not data."""
    if not bin_width > 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    from pyspark.sql import Window

    total = h.agg(F.sum("n").alias("_total"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = h.withColumn("_cum", F.sum("n").over(w)).crossJoin(
        F.broadcast(total)
    )
    target = F.ceil(F.lit(q) * F.col("_total")).cast("long")
    return (
        cum.filter(F.col("_cum") >= target)
        .agg(
            F.min("bin").alias("_qbin"),
            F.max("_total").alias("total_n"),
        )
        # empty histogram -> zero rows (not one all-NULL row), matching the
        # GROUP-BY-shaped SQL oracle on empty input
        .filter(F.col("_qbin").isNotNull())
        .select(
            "total_n",
            (F.col("_qbin") * F.lit(float(bin_width)))
            .cast("double")
            .alias("quantile_estimate"),
        )
    )


def grouped_median_disc(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "median",
) -> DataFrame:
    """Exact discrete (lower) median per group: the value at sorted position
    ``ceil(n/2)``.  Windowed — one shuffle+sort per group key — where
    Spark's exact ``percentile`` aggregate instead buffers every group's
    values inside a single aggregation buffer (OOM-prone for hot groups).
    Equal values make the position's VALUE well-defined no matter how
    row_number breaks their tie, so the result is deterministic and
    engine-portable."""
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(value_col)
    wc = Window.partitionBy(*group_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .filter(F.col("_rn") == F.ceil(F.col("_n") / 2))
        .select(*group_cols, F.col(value_col).alias(out_col))
    )
