"""Ordered funnel analysis over an event stream.

The classic product-analytics question the reference's event models stop
short of (its dbt marts do per-day rollups and sessionization): of the users
who did step 1, how many went on to do step 2 AFTER step 1, then step 3
AFTER step 2 — earliest-completion semantics (each step's timestamp is the
MINIMUM event time strictly after the previous step's timestamp).

Spark-first shape: ONE filtered scan of the steps' event types, ONE shuffle
(groupBy user, collect the sorted per-user event sequence), then a linear
``F.aggregate`` fold that advances the step cursor — the per-user state is
``len(steps)`` timestamps regardless of event count.  The k-pass SQL
formulation (one filtered MIN-aggregate + join per step, which the DuckDB
oracle uses) scans the corpus k times and shuffles k times; at 100 TB the
single-shuffle fold wins.  Skew note: a hot user's collected sequence is
bounded by that user's step-type event count — when a synthetic/bot user
dominates, pre-cap with ``cap_per_group`` before calling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user funnel completion: ``(user, step_1_ts..step_k_ts, depth)``.

    ``step_i_ts`` is the earliest event of ``steps[i]`` strictly after
    ``step_{i-1}_ts`` (NULL if never reached); ``depth`` counts completed
    steps.  Only users with at least one step-1 event appear.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = df.filter(F.col(type_col).isin(list(steps))).select(
        F.col(user_col), F.col(ts_col).alias("_ts"), F.col(type_col).alias("_et")
    )
    seq = ev.groupBy(user_col).agg(
        F.sort_array(F.collect_list(F.struct("_ts", "_et"))).alias("_seq")
    )

    names = [f"step_{i + 1}_ts" for i in range(len(steps))]
    null_ts = F.lit(None).cast("timestamp")

    def advance(acc, x):
        fields = []
        for i, s in enumerate(steps):
            cur = acc.getField(names[i])
            hit = (x.getField("_et") == s) & cur.isNull()
            if i > 0:
                prev = acc.getField(names[i - 1])
                hit = hit & prev.isNotNull() & (x.getField("_ts") > prev)
            fields.append(
                F.when(hit, x.getField("_ts")).otherwise(cur).alias(names[i])
            )
        return F.struct(*fields)

    zero = F.struct(*[null_ts.alias(n) for n in names])
    folded = seq.select(
        user_col, F.aggregate("_seq", zero, advance).alias("_f")
    )
    depth = sum(
        (F.col(f"_f.{n}").isNotNull().cast("int") for n in names), F.lit(0)
    )
    return folded.select(
        user_col,
        *[F.col(f"_f.{n}").alias(n) for n in names],
        depth.alias("depth"),
    ).filter(F.col(names[0]).isNotNull())


def funnel_summary(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    per_user: DataFrame | None = None,
) -> DataFrame:
    """Step-level conversion counts: ``(step_idx, step_name, n_users)`` —
    users whose funnel depth reached at least that step.  ONE conditional
    aggregation over the per-user funnel frame (a per-step filter+count
    would recompute the funnel k times), unpivoted with ``stack``.  Pass
    ``per_user`` (a :func:`funnel` frame, e.g. checkpointed) to reuse an
    existing computation."""
    if per_user is None:
        per_user = funnel(df, steps, user_col, ts_col, type_col)
    counts = per_user.agg(
        *[
            F.coalesce(
                F.sum((F.col("depth") >= i + 1).cast("long")), F.lit(0)
            ).alias(f"_c{i}")
            for i in range(len(steps))
        ]
    )
    stack_args = ", ".join(
        f"{i + 1}, '{s}', _c{i}" for i, s in enumerate(steps)
    )
    return counts.select(
        F.expr(
            f"stack({len(steps)}, {stack_args}) AS (step_idx, step_name, n_users)"
        )
    )


def cohort_retention(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-seen period, counted
    in each later period they were active — the companion readout to
    :func:`funnel` in any product-analytics suite.

    Two aggregations, both shuffling only (user, period)-grained rows: the
    first-seen reduction and the distinct (user, period) activity set; the
    join is on user (the cohort side is user-grained, broadcastable when
    the user dimension fits).  ``period_idx`` counts whole periods since
    the cohort start (day-difference integer division — engine-portable,
    unlike week-diff functions with locale-dependent boundaries).
    Returns (cohort, period, period_idx, n_users)."""
    d = F.date_trunc(grain, F.col(ts_col))
    days = {"week": 7, "day": 1, "month": None}.get(grain, None)
    first = df.groupBy(user_col).agg(F.min(d).alias("cohort"))
    act = df.select(F.col(user_col), d.alias("period")).distinct()
    joined = act.join(first, user_col)
    if days is not None:
        idx = (
            F.datediff(F.col("period"), F.col("cohort")) / F.lit(days)
        ).cast("int")
    else:  # calendar months: non-constant day counts
        idx = (
            (F.year("period") - F.year("cohort")) * 12
            + (F.month("period") - F.month("cohort"))
        ).cast("int")
    return (
        joined.groupBy("cohort", "period")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .withColumn("period_idx", idx)
        .select("cohort", "period", "period_idx", "n_users")
    )
