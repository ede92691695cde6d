"""Lookup transform — the reference's core join operator (SURVEY §2.4 J1/J2).

Reference semantics (/root/reference/src/parser/models.py:74-85, parse at
src/parser/ssis_parser.py:378-415; instances SalesFactETL.dtsx:125-227):
an equi LEFT JOIN of the streaming rows against a cached dimension, with

- ``cache_mode`` Full (CacheType 0): whole dim in memory -> ``F.broadcast``.
  This is the 100 TB-critical decision: the fact side never shuffles; each
  executor probes a local hash map (BroadcastHashJoin).
- ``no_match``: FailComponent (row error -> we assert zero unmatched) or
  IgnoreFailure (null-extend -> plain left join).
- dimension flag filters (``IsCurrent = 1`` / ``IsActive = 1``,
  fct_sales.sql:52,64) applied to the build side BEFORE the join so the
  broadcast table stays minimal.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class LookupNoMatch(Enum):
    FAIL = "FailComponent"      # NoMatchBehavior 0
    IGNORE = "IgnoreFailure"    # NoMatchBehavior 1
    INNER = "RedirectNoMatch"   # drop unmatched (redirect-to-error analog)


def _ci_fold(
    df: DataFrame, keys: list[str], keep_original: bool = True
) -> tuple[DataFrame, dict[str, str]]:
    """Case-insensitive collation prep: replace each STRING join key with
    its ``lower()`` fold, optionally stashing the original value under a
    reserved name so the caller can restore output case after the join.
    Non-string keys (ints, dates) pass through — SQL Server collation
    only affects character data.  Returns the folded frame and the stash
    map (key -> stash column; empty when ``keep_original=False``)."""
    dtypes = dict(df.dtypes)
    stash: dict[str, str] = {}
    out = df
    for k in keys:
        if not dtypes.get(k, "").startswith(("string", "varchar", "char")):
            continue
        if keep_original:
            s = f"__ci_orig_{k}"
            while s in out.columns:
                s = "_" + s
            stash[k] = s
            out = out.withColumn(s, F.col(k))
        out = out.withColumn(k, F.lower(F.col(k)))
    return out, stash


def lookup(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | Column,
    select: dict[str, str],
    dim_filter: Column | None = None,
    no_match: LookupNoMatch = LookupNoMatch.IGNORE,
    broadcast: bool = True,
    ci: bool = False,
) -> DataFrame:
    """J1: broadcast left-join lookup.

    ``select``: dim column -> output alias map (the SSIS lookup's output
    column list); only these columns (plus join keys) are broadcast, keeping
    the build side narrow.

    ``ci=True`` compares STRING join keys case-insensitively — SQL Server's
    default collation (``SQL_Latin1_General_CP1_CI_AS``), which the
    reference's lookups and staging joins inherit
    (samples/ssis_packages/CustomerDataLoad.dtsx:122-129,
    dbt_project/models/staging/stg_crm__customers.sql:37-67).  Both sides
    fold to ``lower()`` for the probe only; the output keeps the FACT
    side's original key case (the SSIS lookup streams input rows through
    unchanged).  Requires list-form ``on``; the fold is a per-row
    expression, so broadcast/shuffle strategy and pushdown are unaffected.
    """
    build = dim
    if dim_filter is not None:
        build = build.filter(dim_filter)
    need_marker = no_match is LookupNoMatch.FAIL
    if ci and not isinstance(on, list):
        raise ValueError("lookup(ci=True) requires list-form join keys")
    if isinstance(on, list):
        # prune the build side to join keys + requested outputs before broadcast
        build = build.select(
            *on,
            *[F.col(c).alias(a) for c, a in select.items() if c not in on],
        )
    fact_stash: dict[str, str] = {}
    if ci:
        fact, fact_stash = _ci_fold(fact, on)
        build, _ = _ci_fold(build, on, keep_original=False)
    marker = None
    if need_marker:
        # A matched dim row may legitimately carry NULL output columns, so
        # match detection needs a dedicated always-non-null marker — named to
        # dodge any column the fact side already carries.
        marker = "__lookup_matched__"
        while marker in fact.columns or marker in build.columns:
            marker = "_" + marker
        build = build.withColumn(marker, F.lit(1))

    if broadcast:
        build = F.broadcast(build)

    how = "inner" if no_match is LookupNoMatch.INNER else "left"
    joined = fact.join(build, on=on, how=how)

    if need_marker:
        unmatched = joined.filter(F.col(marker).isNull()).limit(1).count()
        if unmatched:
            raise ValueError(
                f"Lookup FailComponent: unmatched rows on keys {on}"
            )
        joined = joined.drop(marker)
    for k, s in fact_stash.items():  # restore the fact side's key case
        joined = joined.withColumn(k, F.col(s)).drop(s)
    return joined


def lookup_chain(fact: DataFrame, lookups: list[dict]) -> DataFrame:
    """J2: sequential CTE-style chain of lookups (fct_sales.sql:44-75).

    Each element is kwargs for :func:`lookup`. The chain stays one Catalyst
    plan: N BroadcastHashJoins over a single pass of the fact table — no
    fact-side shuffle at any size.
    """
    out = fact
    for kw in lookups:
        out = lookup(out, **kw)
    return out
