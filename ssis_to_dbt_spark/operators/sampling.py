"""Deterministic sampling / splitting operators for training-data pipelines.

Reproducibility is the constraint: a train/test assignment must not change
when the job reruns, when partitioning changes, or when rows arrive in a
different order.  Everything here is CONTENT-ADDRESSED (md5 of a key), never
``rand()`` — the same row lands in the same split on any engine, which also
makes the operators oracle-checkable.

All bucket logic compares fixed-width lowercase HEX PREFIXES of the hash as
strings: equal-width hex strings order exactly like their numeric values, and
string comparison is portable across engines (no hex→int builtin needed).

- ``hash_split``: stable percentage split on the 2-hex-char (256-bucket)
  prefix.
- ``stratified_sample``: per-stratum fractions on the 4-hex-char
  (65536-bucket) prefix.
- ``token_budget_sample``: deterministic subset whose token counts fill a
  budget.  The scale-safe shape: a 60-bit md5 slice splits rows into
  ``n_buckets`` buckets (auto-sized from the corpus token total), each
  bucket gets budget/n and runs its own cumulative-sum window
  — windows partition by bucket, so no single-partition global sort exists at
  any data size (a global ``ORDER BY hash`` cumsum would serialize 100 TB
  through one task).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_hex(key: Column) -> Column:
    return F.md5(key.cast("string"))


def hash_split(
    df: DataFrame,
    key_col: str,
    test_pct: int = 10,
    split_col: str = "split",
) -> DataFrame:
    """Stable train/test split: 2-hex-char prefix of md5(key) under the
    threshold.  Realized fraction is exact over 256 buckets
    (10% -> 25/256 ≈ 9.77%)."""
    # test_pct >= 100 would render a 3-char threshold ("100") that orders
    # BELOW every 2-char hex prefix — short-circuit the degenerate splits
    if test_pct >= 100:
        return df.withColumn(split_col, F.lit("test"))
    if test_pct <= 0:
        return df.withColumn(split_col, F.lit("train"))
    threshold = f"{(256 * test_pct) // 100:02x}"
    prefix = F.substring(_hash_hex(F.col(key_col)), 1, 2)
    return df.withColumn(
        split_col,
        F.when(prefix < threshold, F.lit("test")).otherwise(F.lit("train")),
    )


def kfold_split(
    df: DataFrame,
    key_col: str,
    k: int = 5,
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment: ``fold = md5_60bit(key) % k`` —
    the cross-validation generalization of :func:`hash_split`.  Stable
    under repartitioning, re-runs, and data growth (a key's fold never
    changes), map-only, and reproducible by any engine that can md5.
    Fold sizes are hash-uniform, not exactly equal."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = F.conv(F.substring(_hash_hex(F.col(key_col)), 1, 15), 16, 10).cast(
        "long"
    )
    return df.withColumn(fold_col, (h % k).cast("int"))


def quantile_buckets(
    df: DataFrame,
    score_col: str,
    n_buckets: int = 3,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Exact-quantile bucketing (the CCNet head/middle/tail pattern over a
    perplexity-style score, generalized to ``n_buckets``): one tiny
    percentile aggregation computes the cutoffs, broadcast back, and every
    row buckets map-side by comparison — NO global sort/ntile window, which
    is what makes this shape survive 100 TB.  Boundary rule: a score equal
    to cutoff i belongs to bucket i (inclusive-lower), deterministic.
    Exact linear-interpolated percentiles of integer-ratio doubles are
    IEEE-identical across engines, so the bucket assignment is
    oracle-reproducible."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    fracs = ", ".join(
        f"CAST({i}.0 / {n_buckets}.0 AS DOUBLE)" for i in range(1, n_buckets)
    )
    cuts = df.agg(
        F.expr(f"percentile({score_col}, array({fracs}))").alias("_cuts")
    )
    b = F.lit(n_buckets)
    for i in range(n_buckets - 1, 0, -1):
        b = F.when(
            F.col(score_col) <= F.element_at("_cuts", i), F.lit(i)
        ).otherwise(b)
    return df.crossJoin(F.broadcast(cuts)).withColumn(
        bucket_col, b.cast("int")
    ).drop("_cuts")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row when its 4-hex-char
    hash prefix falls under the stratum's fraction of the 65536 buckets."""
    def hex4(frac: float) -> str:
        # fraction >= 1.0 would render a 5-char threshold ("10000") that
        # orders BELOW most 4-char prefixes; "zzzz" sorts above every hex
        # prefix, so such strata keep ALL rows
        if frac >= 1.0:
            return "zzzz"
        return f"{max(int(frac * 65536), 0):04x}"

    prefix = F.substring(_hash_hex(F.col(key_col)), 1, 4)
    threshold = F.lit(hex4(default_fraction))
    for value, f in fractions.items():
        threshold = F.when(
            F.col(strata_col) == value, F.lit(hex4(float(f)))
        ).otherwise(threshold)
    return df.filter(prefix < threshold)


def mixture_sample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, int],
    key_col: str,
) -> DataFrame:
    """Resample a corpus to a target group mixture (domain reweighting).

    Given INTEGER target weights per group (e.g. ``{"en": 6, "de": 3,
    "other": 1}``), keeps the LARGEST subset whose group proportions match
    the weights: the binding group (smallest ``n_g / w_g``) is kept whole
    and every other group is down-sampled to match.  Groups absent from
    ``weights`` are dropped.

    Everything is integer/decimal arithmetic so the kept set is
    engine-reproducible:

    - feasible total  ``T = min_g floor(n_g * W / w_g)`` with ``W = sum(w)``;
    - per-group admit buckets ``b_g = floor(65536 * T * w_g / (W * n_g))``
      (DECIMAL(38,0) products — no bigint overflow at any corpus size);
    - a row is kept when the integer value of its 4-hex-char md5(key) prefix
      is ``< b_g`` — the same content-addressed rule as ``stratified_sample``,
      so membership never depends on partitioning or row order.

    Plan shape: one small groupBy for counts, a 1-row scalar min, then the
    per-group thresholds broadcast back onto the corpus — no driver collect,
    no extra shuffle of the data itself (the filter is map-side under the
    broadcast join).
    """
    total_w = int(sum(weights.values()))
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"))
        .withColumn(
            "_w",
            F.coalesce(
                *[
                    F.when(F.col(group_col) == g, F.lit(int(w)))
                    for g, w in weights.items()
                ]
                + [F.lit(None)]
            ).cast("decimal(38,0)"),
        )
        .filter(F.col("_w").isNotNull())
    )
    feasible = counts.agg(
        F.min(F.expr(f"_n * {total_w} DIV _w")).cast("decimal(38,0)").alias("_t")
    )
    thresholds = (
        counts.crossJoin(F.broadcast(feasible))
        .withColumn(
            "_admit",
            F.expr(f"CAST(65536 * _t * _w AS DECIMAL(38,0)) DIV ({total_w} * _n)")
            .cast("long"),
        )
        .select(group_col, "_admit")
    )
    prefix_int = F.conv(
        F.substring(_hash_hex(F.col(key_col)), 1, 4), 16, 10
    ).cast("long")
    return (
        df.join(F.broadcast(thresholds), group_col)
        .filter(prefix_int < F.col("_admit"))
        .drop("_admit")
    )


def temperature_mixture(
    df: DataFrame,
    group_col: str,
    key_col: str,
) -> DataFrame:
    """Temperature-flattened source mixture (tau = 2, the common multilingual
    /multi-domain rebalancing): target group proportions follow
    ``sqrt(n_g)`` instead of ``n_g``, boosting small sources and shrinking
    dominant ones without ever upsampling.

    This is :func:`mixture_sample` with DATA-DERIVED integer weights
    ``w_g = floor(sqrt(n_g))``: IEEE-754 ``sqrt`` is correctly rounded, so
    the floor is engine-portable-exact, and everything downstream is the
    same DECIMAL(38,0) feasible-total + 65536-bucket admit arithmetic —
    content-addressed membership, reproducible under any partitioning.

    Plan shape: one tiny groupBy for counts, two 1-row scalar aggregates
    (total weight, feasible total), thresholds broadcast back onto the
    corpus — no driver collect, and the corpus itself is filtered map-side
    under the broadcast join (never re-shuffled), which is the 100 TB shape.
    Groups with ``n_g = 0`` cannot occur; ``floor(sqrt(n_g)) >= 1`` keeps
    every observed group represented.  The admit bucket is quantized to
    65536 levels, so a group whose fair share falls below 1/65536 of its
    own size would floor to an admit of 0 — the threshold is therefore
    clamped to ``greatest(admit, 1)`` (mirrored in the SQL oracle), which
    keeps a sliver of even pathologically dominant groups rather than
    silently dropping them; the proportion error from the clamp is at most
    one 1/65536 bucket per group.
    """
    counts = (
        df.groupBy(group_col)
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"))
        .withColumn(
            "_w",
            F.floor(F.sqrt(F.col("_n").cast("double"))).cast("decimal(38,0)"),
        )
    )
    total_w = counts.agg(F.sum("_w").cast("decimal(38,0)").alias("_tw"))
    j = counts.crossJoin(F.broadcast(total_w))
    feasible = j.agg(
        F.min(F.expr("_n * _tw DIV _w")).cast("decimal(38,0)").alias("_t")
    )
    thresholds = (
        j.crossJoin(F.broadcast(feasible))
        .withColumn(
            "_admit",
            F.greatest(
                F.expr(
                    "CAST(65536 * _t * _w AS DECIMAL(38,0)) DIV (_tw * _n)"
                ).cast("long"),
                F.lit(1).cast("long"),
            ),
        )
        .select(group_col, "_admit")
    )
    prefix_int = F.conv(
        F.substring(_hash_hex(F.col(key_col)), 1, 4), 16, 10
    ).cast("long")
    return (
        df.join(F.broadcast(thresholds), group_col)
        .filter(prefix_int < F.col("_admit"))
        .drop("_admit")
    )


def token_budget_sample(
    df: DataFrame,
    token_col: str,
    budget: int,
    key_col: str,
    n_buckets: int | None = 16,
    target_bucket_tokens: int | None = None,
) -> DataFrame:
    """Deterministic subset whose summed ``token_col`` fills ``budget``.

    Rows order by content hash within ``n_buckets`` md5 buckets; each
    bucket admits rows while its cumulative token count stays within
    ``budget / n_buckets``.  Deterministic, engine-independent, and
    parallel (cumsum windows partition by bucket).

    r9: ``n_buckets=None`` auto-sizes the stream count from the CORPUS
    token total (``max(16, ceil(total / target))``, default 2^24-token
    streams — the cumsum window scans every corpus row in its bucket
    regardless of the budget, so the bucket count must scale with the
    corpus, exactly like the packers).  The floor of 16 keeps the
    per-bucket admission quantum no coarser than the fixed form's.
    Different bucket counts admit different (equally budget-valid)
    subsets — pin ``n_buckets`` when reproducibility across corpus
    growth matters."""
    if n_buckets is None:
        target = (
            (1 << 24)
            if target_bucket_tokens is None
            else int(target_bucket_tokens)
        )
        if target < 1:
            raise ValueError("target_bucket_tokens must be >= 1")
        total = (
            df.agg(
                F.sum(F.col(token_col).cast("long")).alias("_t")
            ).collect()[0]["_t"]
            or 0
        )
        n_buckets = max(16, (int(total) + target - 1) // target)
    nb = int(n_buckets)
    h = _hash_hex(F.col(key_col))
    per_bucket = budget / float(nb)
    w = (
        Window.partitionBy("_bucket")
        .orderBy("_h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_h", h)
        .withColumn(
            "_bucket",
            # 15-hex-char (60-bit) slice, NOT a 2-char one: auto-sizing
            # targets corpora where n_buckets >> 256, and a byte-wide
            # bucket id would leave every bucket >= 256 empty — silently
            # admitting only ~256/nb of the budget (r9 ADVICE, high)
            F.pmod(
                F.conv(F.substring("_h", 1, 15), 16, 10).cast("long"),
                F.lit(nb),
            ),
        )
        .withColumn("_cum", F.sum(F.col(token_col)).over(w))
        .filter(F.col("_cum") <= per_bucket)
        .drop("_h", "_bucket", "_cum")
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    priority_col: str = "priority",
) -> DataFrame:
    """Deterministic weighted sampling without replacement: each row holds
    ``weight_col`` (a small positive integer) lottery tickets
    ``md5(key:i)``, its priority is its BEST (lowest) ticket, and the k
    best-priority rows win — the exact-arithmetic analog of
    Efraimidis-Spirakis A-ES (u^(1/w) keys): a row's chance of holding the
    global minimum ticket is proportional to its ticket count.  Hex-string
    comparison replaces the transcendental ln/pow of A-ES, so the SAMPLE —
    not just its size — is bit-reproducible by an external SQL engine.

    Scale shape: ticket generation is a map-only ``transform`` over a
    per-row sequence (O(weight) md5 calls per row — integer weights are
    domain-mixing weights, single digits in practice); selection is
    ``orderBy().limit(k)`` = TakeOrderedAndProject, k rows per partition
    then a k-row driver merge — never a global sort.

    Rows with NULL or non-positive weight hold no tickets and are filtered
    out up front.  Left in, they would WIN instead of losing:
    ``sequence(1, 0)`` auto-selects step -1 and yields ``[1, 0]`` (two
    tickets), and a NULL weight yields a NULL priority, which ascending
    sort places FIRST — an unconditional win.
    """
    eligible = df.filter(F.col(weight_col).cast("int") >= 1)
    tickets = F.transform(
        F.sequence(F.lit(1), F.col(weight_col).cast("int")),
        lambda i: F.md5(
            F.concat_ws(":", F.col(key_col).cast("string"), i.cast("string"))
        ),
    )
    out = eligible.withColumn(priority_col, F.array_min(tickets))
    return out.orderBy(F.col(priority_col), F.col(key_col)).limit(k)


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    n: int,
    key_col: str,
    rank_col: str | None = None,
) -> DataFrame:
    """Per-group document cap (the C4/Gopher per-domain cap): keep at most
    ``n`` rows per group, chosen deterministically by content-hash order
    (``md5(key)``, key value as tiebreak) — never ``rand()``, so the kept
    set is partition-order-independent and oracle-reproducible.

    100 TB shape: ONE window shuffle on the group columns; per-group state
    is a row counter.  Spark's rank-limit pushdown plants a PARTIAL
    ``WindowGroupLimit`` BEFORE the exchange (plan-asserted in
    ``test_plans.py``), so every map task pre-trims to <= n rows per group
    and the shuffle carries at most ``n * groups * map_partitions`` rows —
    a pathological domain holding half the corpus still ships only n rows
    per map task, not its full weight.  With ``rank_col`` the cap keeps
    the TOP-n by that column
    (descending; e.g. a quality score) instead of hash order — caps then
    double as per-domain best-of selection.
    """
    if n < 1:
        raise ValueError(f"cap must be >= 1, got {n}")
    # NULL ordering is explicit because engines disagree on the ascending
    # default (Spark: NULLS FIRST, DuckDB: NULLS LAST) — a NULL key or rank
    # must LOSE the cap everywhere, never win it
    if rank_col is not None:
        order = [
            F.col(rank_col).desc_nulls_last(),
            _hash_hex(F.col(key_col)).asc_nulls_last(),
        ]
    else:
        order = [
            _hash_hex(F.col(key_col)).asc_nulls_last(),
            F.col(key_col).asc_nulls_last(),
        ]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    n_shards: int = 16,
    seed: str = "s0",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle into training shards — the last step
    before a corpus becomes training input: every row gets a stable
    ``(shard, pos)`` from ``md5(seed || key)``, so the training order is
    (a) pseudorandom w.r.t. any data attribute, (b) reproducible from
    the seed alone on any engine with md5, and (c) re-shufflable by
    changing ``seed`` without touching the data.

    shard = first 4 hex chars of the keyed hash mod ``n_shards``;
    pos    = dense row_number within the shard ordered by (full hash,
    key) — the key tiebreak makes positions total even under md5
    collisions.

    100 TB shape: NO global sort — one exchange on the shard key and a
    per-shard sort (Spark's ORDER-BY-within-partition path), each shard
    written/consumed independently.  A global ORDER BY md5 would funnel
    the corpus through a single range-partitioned sort; sharding first
    bounds every sort at corpus/n_shards.
    """
    h = F.md5(F.concat(F.lit(str(seed)), F.lit("|"),
                       F.col(key_col).cast("string")))
    shard = (
        F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
        % int(n_shards)
    ).cast("int")
    out = df.withColumn(shard_col, shard).withColumn("_h", h)
    w = Window.partitionBy(shard_col).orderBy(
        F.col("_h"), F.col(key_col).asc_nulls_last()
    )
    return (
        out.withColumn(pos_col, F.row_number().over(w))
        .drop("_h")
    )
