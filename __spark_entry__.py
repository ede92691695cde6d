"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``ssis_to_dbt_spark.catalog``; one entry per
operator family from SURVEY.md §2 plus the LLM-pipeline extensions
(dedup / similarity / text analysis / streaming windows).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession

from ssis_to_dbt_spark import catalog
from ssis_to_dbt_spark.session import tune_for_correctness

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the fct_sales star join (lineitem ⋈ orders with broadcast
    customer/part lookups, surrogate keys, date key) on sf0.001."""
    tune_for_correctness(spark)
    return catalog.q_fct_sales_star(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 entries (the driver's verdict window — the driver
    verifies at most 50): every SURVEY.md §2 operator family plus the
    LLM-pipeline extensions, with same-family queries packaged as tagged
    UNION ALL suites (COVERAGE.md maps suite components; individual
    queries stay in catalog.ALL_QUERIES).  r9 adds ``crawl_ingest_docs``
    — the two-batch continuous-crawl ingest loop — in the slot freed by
    folding the k-NN join into ``ann_topk_suite`` (component ``knn``).
    r11 folds the two r10 registry-only operators into window suites
    for driver-visible verdicts: JPEG decode as ``multimodal_decode``
    component ``jpeg``, within-batch ingest dedup as
    ``crawl_ingest_docs`` components ``wb_pruned/wb_reject/wb_accept``.
    r12 folds the five r11 registry-only operators the same way:
    ``ci_collation_customers`` -> ``join_strategies`` (``ci_*``),
    ``time_contract_events`` -> ``events_windows`` (``time_contract``),
    ``semantic_decontam_embeddings``/``streaming_ivf_probe`` ->
    ``ann_topk_suite`` (``decontam``/``sivf``), and
    ``shuffle_shards_docs`` -> ``sampling_splits`` (``shards``)."""
    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_for_correctness(spark)
            return fn(spark, sf_dir)
        return run

    return {name: wrap(fn) for name, fn in catalog.QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for EVERY queries() entry — no
    rows-only checks left: the xxhash64 production paths are represented by
    their fully-oracled md5 twins inside the window."""
    return dict(catalog.ORACLES)
