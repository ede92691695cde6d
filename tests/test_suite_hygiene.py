"""Suite-slot hygiene (round-8 VERDICT ask): the driver window is frozen
at 50 entries (the driver verifies at most 50 — CORRECTNESS_r04 held
exactly the first 50 of 77; r9 freed a slot for the crawl-ingest loop by
folding knn into ann_topk_suite) with same-family
queries packaged as tagged UNION suites — one
hash covers every component, so a component that silently drops out of the
union (or degrades to an all-NULL projection that the hash can't see) would
still leave the entry green.  This pins, per suite, (a) the EXACT component
tag set at fixture scale and (b) that every component projects at least one
non-null value-bearing column into the hash."""

import pytest
from pyspark.sql import functions as F

from ssis_to_dbt_spark import catalog

SF = "/root/testdata/sf0.001"

# The pinned tag sets: adding a component without updating this map fails
# loudly here (the point — suite membership is a reviewed contract, not an
# accident of whichever arms happened to union).
EXPECTED = {
    "agg_daily_rollup": {"full", "incr"},
    "ngram_jaccard_docs": {"jaccard", "winnow_doc", "winnow_pair"},
    "minhash_pairs_md5": {
        "cand", "cross", "leak_pair", "leak_summary", "prune", "safe_split",
    },
    "containment_kmv_docs": {
        "cms", "cms_merged", "containment", "decontam", "hll_events",
        "hll_merged", "hll_users", "kmv", "kmv_merged",
    },
    "ann_topk_suite": {
        "brute_force", "decontam", "decontam_ivf", "fps", "hard_neg",
        "ivf", "ivf_idx", "km_assign", "km_centroid", "knn", "lsh_md5",
        "project", "proto_assign", "proto_centroid", "quantize",
        "recall", "semdedup", "sivf",
    },
    "events_windows": {
        "cohort", "decay", "funnel_s", "funnel_u12", "funnel_u3", "gap_fill",
        "intervals", "rollup", "sliding", "time_contract", "tumbling",
    },
    "events_totals_suite": {"salted", "salted_join", "stateful"},
    "asof_range_joins": {"asof", "funnel", "range", "scd2_pit"},
    "orchestration_dag": {"foreach", "parallel", "retry", "retry_meta"},
    "join_strategies": {
        "bloom", "bucketed", "ci_cs_miss", "ci_lookup", "ci_semi",
        "cig_group", "cig_distinct", "cig_dup", "cig_sort_top",
        "cif_where_eq", "cif_where_in", "cif_where_like", "cif_expr_eq",
        "cif_expr_ne",
    },
    "multimodal_decode": {
        "bmp", "features", "jpeg", "phash", "phash_cluster", "phash_pair",
        "png", "resize", "wav",
    },
    "corpus_curation": {
        "clean", "contaminated", "dsir_sel", "enrich", "gate", "mixture",
        "pack", "prune",
    },
    "sampling_splits": {
        "dsir", "dsir_apply", "dsir_merge", "hash_split", "kfold", "mixture",
        "shards", "source_cap", "stratified", "temperature", "weighted",
    },
    "token_ops_docs": {
        "bpe", "bpe_doc", "bpe_word", "budget", "chunk", "corpus_dedup",
        "dedup_lines", "dup_spans", "pack", "pack_nosplit",
    },
    "pii_tfidf_docs": {
        "bm25", "bm25_idx", "bm25_stream", "ccnet", "mixed_lang", "nb",
        "pii", "rrf", "rrf_idx", "surprisal", "tfidf",
    },
    "pivot_median_orders": {
        "cube", "hist_p50", "histogram", "median", "pivot", "rolling",
        "unpivot",
    },
    "dtsx_packages": {
        "cdl_merge", "cdl_trunc", "customer_load", "inv_flag",
        "inventory_sync", "order_routing", "sales_agg", "sales_fact",
    },
    "cdc_orders": {"apply", "diff"},
    "crawl_ingest_docs": {
        "accept1", "accept2", "dsir1", "dsir2", "gate1", "gate2", "pack1",
        "pack2", "reject1", "reject2", "wb_accept", "wb_pruned", "wb_reject",
    },
    "parts_fuzzy_pagerank": {"fuzzy", "pagerank", "sorted_nbr"},
    "events_payload_layout": {"json", "zorder"},
    "roundtrip_sinks": {
        "append", "audit", "compact", "csv", "dpo", "evolve", "excel",
        "excel_xls", "json", "orc", "overwrite", "rest",
    },
}


def _suite_entries():
    return sorted(EXPECTED)


class TestSuiteHygiene:
    def test_every_window_suite_is_pinned_here(self, spark):
        """A window entry that exposes a `component` column must have its
        tag set pinned in EXPECTED — new suites can't dodge the audit."""
        missing = []
        for name, fn in catalog.QUERIES.items():
            if name in EXPECTED:
                continue
            df = fn(spark, SF)
            if "component" in df.columns:
                missing.append(name)
        assert not missing, f"unpinned suites: {missing}"

    @pytest.mark.parametrize("name", _suite_entries())
    def test_components_present_and_value_bearing(self, spark, name):
        df = catalog.QUERIES[name](spark, SF)
        others = [c for c in df.columns if c != "component"]
        agg = (
            df.groupBy("component")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[F.count(c).alias(f"_nn_{i}") for i, c in enumerate(others)],
            )
            .collect()
        )
        got = {r["component"] for r in agg}
        assert got == EXPECTED[name], (
            f"{name}: tags {sorted(got)} != pinned {sorted(EXPECTED[name])}"
        )
        for r in agg:
            assert r["_n"] > 0
            # at least one non-component column is non-null somewhere in
            # the group — the component genuinely feeds the value hash
            assert any(
                r[f"_nn_{i}"] > 0 for i in range(len(others))
            ), f"{name}/{r['component']}: all non-component columns NULL"
