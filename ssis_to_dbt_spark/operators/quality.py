"""Validation / data-quality operators (SURVEY §2.14 V1-V4, §2.10 D7).

Reference semantics:
- V1 row-count equality with tolerance (pass == 0, warn < warn_tol, fail)
  /root/reference/src/validation/validator.py:82-126; tolerances
  config/agents.yaml:12-15 (row_count 1%, checksum 0.01%).
- V2 PK integrity: null count + duplicate count
  (validator.py:128-167, src/connections/sql_server.py:208-254).
- V3 numeric checksum SUM/AVG relative variance (validator.py:169-220).
- V4 dbt schema tests not_null / unique / relationships / accepted_values /
  expect_column_values_to_be_between (models/*/schema.yml).
- D7 RAISERROR pre-flight guard (SalesFactETL.dtsx:54-61).

Every check is a DataFrame aggregate — the violation COUNT is computed
distributed and only the scalar verdict reaches the driver, so the same
checks run unchanged against a 100 TB table.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class CheckResult:
    check: str
    status: str          # pass | warning | fail
    detail: dict

    @property
    def ok(self) -> bool:
        return self.status != "fail"


def row_count_compare(
    legacy: DataFrame,
    migrated: DataFrame,
    warn_tolerance: float = 0.0001,
) -> CheckResult:
    """V1: |a-b| relative to legacy count (validator.py:106-115): pass only on
    an exact match, warning strictly below ``warn_tolerance`` (0.01%), fail at
    or above it — a 0.5% row drift FAILS, mirroring the reference."""
    a, b = legacy.count(), migrated.count()
    diff = abs(a - b)
    rel = diff / a if a else (0.0 if b == 0 else 1.0)
    status = "pass" if diff == 0 else ("warning" if rel < warn_tolerance else "fail")
    return CheckResult("row_count", status, {"legacy": a, "migrated": b, "rel": rel})


def pk_integrity(df: DataFrame, pk_cols: list[str]) -> CheckResult:
    """V2: one pass computing null-key and duplicate-key counts."""
    null_pred = None
    for c in pk_cols:
        p = F.col(c).isNull()
        null_pred = p if null_pred is None else (null_pred | p)
    nulls, dups = _pk_counts(df, pk_cols, null_pred)
    status = "pass" if (nulls == 0 and dups == 0) else "fail"
    return CheckResult("pk_integrity", status, {"null_keys": nulls, "dup_keys": dups})


def _pk_counts(df: DataFrame, pk_cols: list[str], null_pred: Column):
    nulls = df.filter(null_pred).count()
    dups = (
        df.groupBy(*pk_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .count()
    )
    return nulls, dups


def checksum_compare(
    legacy: DataFrame,
    migrated: DataFrame,
    numeric_cols: list[str],
    tolerance: float = 0.0001,
) -> CheckResult:
    """V3: SUM/AVG-as-FLOAT per column, relative variance <= 0.01% passes."""
    def sums(df):
        aggs = [
            F.coalesce(F.sum(F.col(c).cast("double")), F.lit(0.0)).alias(c)
            for c in numeric_cols
        ]
        return df.agg(*aggs).first()

    a, b = sums(legacy), sums(migrated)
    detail, status = {}, "pass"
    for c in numeric_cols:
        base = abs(a[c]) if a[c] else 1.0
        var = abs(a[c] - b[c]) / base
        detail[c] = {"legacy": a[c], "migrated": b[c], "variance": var}
        if var > tolerance:
            status = "fail"
    return CheckResult("checksum", status, detail)


# --- V4 dbt schema tests: each returns the VIOLATING rows (empty == pass) ---
#
# ``ci=True`` (r11) runs the string-valued tests under SQL Server
# default-collation semantics — the comparisons a dbt test executes ON
# the CI server: 'Alpha'/'ALPHA' count as duplicates for ``unique``,
# satisfy ``relationships`` against 'alpha', and match accepted values
# case-insensitively.  The fold is expression-side only (lower()), so
# test plans are unchanged.

def not_null_violations(df: DataFrame, col: str) -> DataFrame:
    return df.filter(F.col(col).isNull())


def unique_violations(df: DataFrame, col: str, ci: bool = False) -> DataFrame:
    key = F.lower(F.col(col)) if ci else F.col(col)
    return (
        df.groupBy(key.alias(col))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select(col)
    )


def relationship_violations(
    child: DataFrame, parent: DataFrame, fk: str, pk: str, ci: bool = False
) -> DataFrame:
    if ci:
        from .joins import fk_violations

        return fk_violations(
            child.filter(F.col(fk).isNotNull()), parent, fk, pk, ci=True
        )
    parent_keys = parent.select(F.col(pk).alias(fk)).distinct()
    return child.filter(F.col(fk).isNotNull()).join(parent_keys, on=fk, how="left_anti")


def accepted_values_violations(
    df: DataFrame, col: str, values: list, ci: bool = False
) -> DataFrame:
    if ci:
        folded = [v.lower() if isinstance(v, str) else v for v in values]
        return df.filter(
            ~F.lower(F.col(col)).isin(folded) | F.col(col).isNull()
        )
    return df.filter(~F.col(col).isin(values) | F.col(col).isNull())


def between_violations(df: DataFrame, col: str, lo, hi) -> DataFrame:
    return df.filter(~F.col(col).between(lo, hi) | F.col(col).isNull())


def iqr_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 1.5,
) -> DataFrame:
    """Per-group Tukey-fence outlier detection: rows outside
    ``[p25 - k*IQR, p75 + k*IQR]`` of their group's ``value_col``
    distribution — the distribution-drift guard a corpus QA pass runs on
    doc lengths / token counts per source.

    Scale shape: exact percentiles via ONE aggregation on the (small)
    group keys, bounds broadcast back, outlier test map-side; the final
    count shuffles only per-partition partial aggregates (n_groups rows
    per task), never the data (same two-pass pattern as mixture_sample).
    Returns one row per group: (groups..., n_rows, n_outliers, p25, p75).
    Percentile interpolation is the standard linear rule on both engines,
    and int-valued inputs at quartile fractions make the bounds exact
    binary doubles — deterministic.
    """
    from pyspark.sql import functions as F

    v = F.col(value_col).cast("double")
    stats = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.25)").alias("p25"),
        F.expr(f"percentile({value_col}, 0.75)").alias("p75"),
    )
    bounded = df.join(F.broadcast(stats), group_cols)
    iqr = F.col("p75") - F.col("p25")
    is_out = (v < F.col("p25") - k * iqr) | (v > F.col("p75") + k * iqr)
    return bounded.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(is_out.cast("int")).cast("long").alias("n_outliers"),
        F.first("p25").alias("p25"),
        F.first("p75").alias("p75"),
    )


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: float = 3.0,
) -> DataFrame:
    """Per-group robust outlier detection on the median absolute deviation:
    rows with ``|x - median| > k * MAD`` — unlike Tukey fences
    (:func:`iqr_outliers`), MAD's 50% breakdown point survives a group
    whose tail IS the contamination.

    Scale shape: two tiny aggregations over group keys (median, then median
    of |x - median|) with the data scanned twice but never shuffled — both
    stats broadcast back, the outlier test is map-side, and the final count
    shuffles n_groups partial rows per task.  Exact interpolated medians of
    integer inputs are .5-step doubles, so thresholds are deterministic and
    the DuckDB oracle (``median``/``quantile_cont``) reproduces them
    bit-for-bit.  Degenerate groups (MAD = 0, e.g. >50% identical values)
    flag every deviating row — the documented textbook behavior.
    Returns (groups..., n_rows, n_outliers, med, mad)."""
    from pyspark.sql import functions as F

    v = F.col(value_col).cast("double")
    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    dev = df.join(F.broadcast(med), group_cols).withColumn(
        "_adev", F.abs(v - F.col("med"))
    )
    mad = dev.groupBy(*group_cols).agg(
        F.expr("percentile(_adev, 0.5)").alias("mad"),
        F.first("med").alias("med"),
    )
    tested = df.join(F.broadcast(mad), group_cols)
    is_out = F.abs(v - F.col("med")) > k * F.col("mad")
    return tested.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(is_out.cast("int")).cast("long").alias("n_outliers"),
        F.first("med").alias("med"),
        F.first("mad").alias("mad"),
    )


def preflight_guard(df: DataFrame, min_rows: int = 1, name: str = "preflight") -> int:
    """D7: RAISERROR analog — abort the pipeline when a required input is
    empty/short (SalesFactETL.dtsx:54-61). Uses a LIMIT'd count so the guard
    is O(min_rows), not a full scan."""
    n = df.limit(min_rows).count()
    if n < min_rows:
        raise RuntimeError(f"{name}: expected >= {min_rows} rows, found {n}")
    return n
