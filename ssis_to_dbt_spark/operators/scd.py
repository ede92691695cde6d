"""SCD Type 2 operators (SURVEY §2.4 J4, §2.3 E10-E13, §2.6 W1).

Reference semantics: the SSIS package MERGEs staged customers into the
dimension, updating when the SHA2 change hash differs and inserting new keys
(/root/reference/samples/ssis_packages/CustomerDataLoad.dtsx:165-181); the
dbt rewrite replaces MERGE with a deterministic full rebuild that stamps
surrogate key, change hash, ``is_current`` / ``valid_from`` / ``valid_to``
metadata (dbt_project/models/core/dim_customer.sql:28-81).

Spark-first: both shapes.
- ``scd2_snapshot``: the reference's dbt shape — rebuild from the staged
  snapshot (one narrow projection, no shuffle).
- ``scd2_rebuild``: the windowed multi-version shape (SURVEY §2.6 plan) —
  given a history of records per natural key, derive version chains with
  ``row_number``/``lead`` over a key-partitioned window.  The only shuffle
  is on the natural key, which is exactly the partitioning a 100 TB dimension
  history needs anyway.
- ``merge_upsert``: join-based MERGE for incremental runs — current dim +
  changed/new rows, no Delta dependency (plain-parquet engine), matching the
  reference's own MERGE-free dodge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..expressions import change_hash, surrogate_key


def scd2_snapshot(
    df: DataFrame,
    natural_key: str,
    hash_cols: list[str],
    effective_date_col: str,
    key_alias: str | None = None,
    hash_alias: str = "change_hash",
) -> DataFrame:
    """J4/E10/E11/E13 (dbt shape): stamp surrogate key, change hash, and
    current-row SCD metadata onto a staged snapshot (dim_customer.sql:42-81)."""
    key_alias = key_alias or f"{natural_key}_key"
    return (
        df.withColumn(key_alias, surrogate_key(F.col(natural_key)))
        .withColumn(hash_alias, change_hash(*[F.col(c) for c in hash_cols]))
        .withColumn("is_current", F.lit(True))
        .withColumn("valid_from", F.col(effective_date_col).cast("date"))
        .withColumn("valid_to", F.lit(None).cast("date"))
    )


def scd2_rebuild(
    history: DataFrame,
    natural_key: str,
    change_ts_col: str,
    hash_cols: list[str],
    key_alias: str | None = None,
) -> DataFrame:
    """W1: version chains from a change history.

    Consecutive records per key whose change hash is unchanged collapse into
    one version; each version gets ``version_number``, ``valid_from``,
    ``valid_to`` (next version's start) and ``is_current``.
    """
    key_alias = key_alias or f"{natural_key}_key"
    w = Window.partitionBy(natural_key).orderBy(change_ts_col)

    hashed = history.withColumn(
        "change_hash", change_hash(*[F.col(c) for c in hash_cols])
    )
    # drop consecutive no-change records (hash equal to previous row's)
    deduped = (
        hashed.withColumn("_prev_hash", F.lag("change_hash").over(w))
        .filter(
            F.col("_prev_hash").isNull()
            | (F.col("change_hash") != F.col("_prev_hash"))
        )
        .drop("_prev_hash")
    )
    w2 = Window.partitionBy(natural_key).orderBy(change_ts_col)
    return (
        deduped.withColumn("version_number", F.row_number().over(w2))
        .withColumn("valid_from", F.col(change_ts_col).cast("date"))
        .withColumn(
            "valid_to", F.lead(F.col(change_ts_col).cast("date")).over(w2)
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn(
            key_alias,
            surrogate_key(F.col(natural_key), F.col("version_number")),
        )
    )


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    natural_key: str,
    hash_cols: list[str],
    effective_date_col: str,
    ci: bool = False,
) -> DataFrame:
    """J4 (incremental shape): SCD2 MERGE as a join-based rewrite.

    - source rows with a new key -> inserted as current
    - source rows whose hash differs from the current target row -> target
      row closed out (``valid_to`` set, ``is_current`` false) + new current row
    - unchanged target rows pass through

    ``ci=True`` matches natural keys case-insensitively (SQL Server
    default collation — without it a re-crawled 'ACME' key opens a
    DUPLICATE current row beside the existing 'Acme' one on a migrated
    dimension); the key comparisons fold to ``lower()``, stored and
    incoming key values keep their own case.

    Returns the new dimension state (write with mode('overwrite') or
    partition_overwrite on the natural-key bucket at scale).
    """
    fold = (lambda c: F.lower(c)) if ci else (lambda c: c)
    src = scd2_snapshot(source, natural_key, hash_cols, effective_date_col)

    tgt_current = target.filter(F.col("is_current"))
    tgt_closed = target.filter(~F.col("is_current"))

    src_keyed = src.select(
        F.col(natural_key).alias("_src_key"),
        F.col("change_hash").alias("_src_hash"),
        F.col(effective_date_col).alias("_src_effective"),
    )
    joined = tgt_current.join(
        src_keyed,
        fold(tgt_current[natural_key]) == fold(src_keyed["_src_key"]),
        "left",
    )
    unchanged = joined.filter(
        F.col("_src_key").isNull() | (F.col("change_hash") == F.col("_src_hash"))
    ).select(*target.columns)
    closed_out = (
        joined.filter(
            F.col("_src_key").isNotNull()
            & (F.col("change_hash") != F.col("_src_hash"))
        )
        .withColumn("valid_to", F.col("_src_effective").cast("date"))
        .withColumn("is_current", F.lit(False))
        .select(*target.columns)
    )

    tgt_keys = tgt_current.select(F.col(natural_key).alias("_t_key"), "change_hash")
    incoming = (
        src.join(
            tgt_keys, fold(src[natural_key]) == fold(tgt_keys["_t_key"]), "left"
        )
        .filter(
            F.col("_t_key").isNull()
            | (src["change_hash"] != tgt_keys["change_hash"])
        )
        .select(*[src[c] for c in src.columns])
    )
    return tgt_closed.unionByName(unchanged).unionByName(closed_out).unionByName(
        incoming.select(*target.columns)
    )


def scd2_point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    ts_col: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time join: each fact row picks the dimension VERSION whose
    ``[valid_from, valid_to)`` validity covers the fact's date — the star
    schema's temporal lookup (dbt snapshot joins; Kimball type-2 dim usage).
    ``valid_to IS NULL`` marks the current version (open interval).

    100 TB shape: a plain equi-join on the natural key with the validity
    predicate folded into the join condition — per-key version counts are
    small, so there is no interval-bucketization blowup and Catalyst is free
    to broadcast the dimension; never a nested-loop join.  Comparisons are
    at DATE granularity on both sides, matching how the version chain is
    built."""
    fact_day = F.to_date(facts[ts_col])
    cond = (
        (facts[on] == dim[on])
        & (fact_day >= dim[valid_from])
        & (dim[valid_to].isNull() | (fact_day < dim[valid_to]))
    )
    dim_cols = [dim[c].alias(c) for c in dim.columns if c != on]
    return facts.join(dim, cond, how).select(
        *[facts[c] for c in facts.columns], *dim_cols
    )


def merge_upsert_sql(
    target_table: str,
    source_view: str,
    natural_key: str,
    effective_date_col: str,
    target_cols: list[str],
    ci: bool = False,
) -> list[str]:
    """r11 (r10 VERDICT #7): the transactional ``MERGE INTO`` form of
    :func:`merge_upsert` for lakehouse targets (Delta/Iceberg) that
    support SQL MERGE with row-level updates.  Two statements over the
    same join condition, value-equivalent to the deterministic
    join-rebuild (which stays the oracle):

    1. close-out — current target rows whose ``change_hash`` differs
       from the source's get ``valid_to`` stamped and ``is_current``
       cleared;
    2. insert — after (1) changed keys have NO current row, so a single
       ``WHEN NOT MATCHED`` inserts both brand-new keys and the new
       current version of changed keys.

    ``source_view`` must hold the :func:`scd2_snapshot` of the incoming
    batch (its columns are a superset of ``target_cols``).  Identifiers
    are validated (no quoting escape hatch) since they interpolate into
    SQL.  Note the two statements are two transactions — a reader
    between them sees closed-out rows without their replacement; run
    inside the engine's orchestration retry wrapper where that matters.
    """
    import re

    ident = re.compile(r"^[A-Za-z_][A-Za-z0-9_.]*$")
    for name in [target_table, source_view, natural_key,
                 effective_date_col, *target_cols]:
        if not ident.match(name):
            raise ValueError(f"invalid SQL identifier: {name!r}")
    cols = ", ".join(target_cols)
    vals = ", ".join(f"s.{c}" for c in target_cols)
    on = (
        f"LOWER(t.{natural_key}) = LOWER(s.{natural_key}) AND t.is_current"
        if ci
        else f"t.{natural_key} = s.{natural_key} AND t.is_current"
    )
    close = (
        f"MERGE INTO {target_table} t USING {source_view} s ON {on} "
        f"WHEN MATCHED AND t.change_hash != s.change_hash THEN UPDATE SET "
        f"t.valid_to = CAST(s.{effective_date_col} AS DATE), "
        f"t.is_current = false"
    )
    insert = (
        f"MERGE INTO {target_table} t USING {source_view} s ON {on} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )
    return [close, insert]


def merge_upsert_into(
    spark,
    target_table: str,
    source: DataFrame,
    natural_key: str,
    hash_cols: list[str],
    effective_date_col: str,
    ci: bool = False,
) -> None:
    """SCD2 upsert INTO A TABLE: emits transactional ``MERGE INTO``
    (:func:`merge_upsert_sql`) when the target's provider supports
    row-level MERGE (delta/iceberg — concurrent-writer-safe per
    statement), else falls back to the deterministic join-rebuild +
    overwrite (:func:`merge_upsert` — the reference's own dbt dodge,
    dim_customer.sql:22-26, and the correctness oracle for the MERGE
    path)."""
    provider = ""
    try:
        for r in spark.sql(f"DESCRIBE FORMATTED {target_table}").collect():
            if (r["col_name"] or "").strip() == "Provider":
                provider = (r["data_type"] or "").strip().lower()
    except Exception:
        provider = ""
    target_cols = spark.table(target_table).columns
    snap = scd2_snapshot(source, natural_key, hash_cols, effective_date_col)
    if provider in ("delta", "iceberg"):
        view = f"__merge_src_{abs(hash(target_table)) % 10**8}"
        snap.createOrReplaceTempView(view)
        try:
            for stmt in merge_upsert_sql(
                target_table, view, natural_key,
                effective_date_col, target_cols, ci=ci,
            ):
                spark.sql(stmt)
        finally:
            spark.catalog.dropTempView(view)
        return
    rebuilt = merge_upsert(
        spark.table(target_table), source, natural_key, hash_cols,
        effective_date_col, ci=ci,
    )
    # parquet tables can't MERGE: rebuild + overwrite (read-then-
    # overwrite of the same table needs the lineage broken first)
    rebuilt.localCheckpoint().write.mode("overwrite").format(
        "parquet"
    ).saveAsTable(target_table)
