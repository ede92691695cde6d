from .project import typed_project, ColumnSpec
from .lookup import lookup, lookup_chain, LookupNoMatch
from .graph import pagerank
from .joins import (
    anti_join,
    asof_join,
    bloom_build,
    bloom_prefilter,
    fk_violations,
    fuzzy_pairs,
    merge_join,
    range_join,
    semi_join,
)
from .sampling import (
    hash_split,
    shuffle_shards,
    mixture_sample,
    stratified_sample,
    temperature_mixture,
    token_budget_sample,
)
from .aggregate import (
    checksum_aggregates,
    duplicate_keys,
    grouped_aggregate,
    grouped_median_disc,
    cms_estimate,
    cms_merge,
    cms_sketch,
    cube_aggregate,
    histogram_merge,
    histogram_quantile,
    histogram_sketch_grouped,
    hll_estimate,
    hll_merge,
    hll_registers,
    kmv_distinct,
    kmv_merge_estimate,
    kmv_sketch_grouped,
    rollup_aggregate,
    row_count,
    scalar_aggregate,
    top_k_latest,
)
from .split import conditional_split, conditional_split_tagged, data_conversion, data_conversion_with_errors
from .setops import merge_sorted, sort, union_all
from .scd import (merge_upsert, merge_upsert_into, merge_upsert_sql,
                  scd2_point_in_time_join, scd2_rebuild, scd2_snapshot)
from .incremental import (
    incremental_merge,
    max_watermark,
    scalar_bound,
    watermark_filter,
)
from .script import pandas_scalar_udf, script_apply_grouped, script_map
from .window import (
    distributed_global_rank,
    moving_aggregate,
    ntile_buckets,
    offset_compare,
    ranked,
    running_aggregate,
    time_decay_score,
    window_spec,
)
from .layout import (
    morton_interleave,
    zorder_key,
    zorder_prune_files,
    zorder_scan,
    zorder_stats,
    zorder_write,
)
from .skew import (
    auto_skew_join,
    detect_hot_keys,
    salted_aggregate,
    salted_join,
    top_keys,
)
from .quality import (
    accepted_values_violations,
    between_violations,
    not_null_violations,
    pk_integrity,
    preflight_guard,
    relationship_violations,
    row_count_compare,
    checksum_compare,
    unique_violations,
)
from .report import ModelValidation, ValidationReport

__all__ = [
    "typed_project", "ColumnSpec",
    "lookup", "lookup_chain", "LookupNoMatch",
    "asof_join", "fuzzy_pairs", "pagerank", "range_join", "merge_join", "semi_join", "anti_join",
    "bloom_build", "bloom_prefilter",
    "hash_split", "mixture_sample", "shuffle_shards", "stratified_sample",
    "temperature_mixture",
    "token_budget_sample",
    "fk_violations", "kmv_distinct", "kmv_sketch_grouped", "kmv_merge_estimate", "rollup_aggregate", "grouped_median_disc",
    "histogram_sketch_grouped", "histogram_merge", "histogram_quantile",
    "cms_sketch", "cms_merge", "cms_estimate", "cube_aggregate",
    "hll_registers", "hll_merge", "hll_estimate",
    "grouped_aggregate", "scalar_aggregate", "checksum_aggregates",
    "duplicate_keys", "row_count", "top_k_latest",
    "conditional_split", "conditional_split_tagged", "data_conversion", "data_conversion_with_errors",
    "union_all", "merge_sorted", "sort",
    "scd2_rebuild", "scd2_snapshot", "merge_upsert", "merge_upsert_into",
    "merge_upsert_sql", "scd2_point_in_time_join",
    "watermark_filter", "max_watermark", "scalar_bound", "incremental_merge",
    "pandas_scalar_udf", "script_map", "script_apply_grouped",
    "distributed_global_rank",
    "ranked", "offset_compare", "running_aggregate", "moving_aggregate",
    "ntile_buckets", "time_decay_score", "window_spec",
    "auto_skew_join", "detect_hot_keys", "salted_aggregate", "salted_join",
    "top_keys",
    "morton_interleave", "zorder_key", "zorder_prune_files", "zorder_scan",
    "zorder_stats", "zorder_write",
    "row_count_compare", "pk_integrity", "checksum_compare",
    "not_null_violations", "unique_violations", "relationship_violations",
    "accepted_values_violations", "between_violations", "preflight_guard",
    "ModelValidation", "ValidationReport",
]
