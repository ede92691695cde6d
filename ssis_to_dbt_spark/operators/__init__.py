from .project import typed_project, ColumnSpec
from .lookup import lookup, LookupNoMatch
from .joins import merge_join, semi_join, anti_join, fk_violations
from .aggregate import (
    checksum_aggregates,
    duplicate_keys,
    grouped_aggregate,
    row_count,
    scalar_aggregate,
    top_k_latest,
)
from .split import conditional_split, conditional_split_tagged, data_conversion
from .setops import merge_sorted, union_all
from .scd import scd2_rebuild, scd2_snapshot
from .incremental import max_watermark, watermark_filter
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

__all__ = [
    "typed_project", "ColumnSpec",
    "lookup", "LookupNoMatch",
    "merge_join", "semi_join", "anti_join", "fk_violations",
    "grouped_aggregate", "scalar_aggregate", "checksum_aggregates",
    "duplicate_keys", "row_count", "top_k_latest",
    "conditional_split", "conditional_split_tagged", "data_conversion",
    "union_all", "merge_sorted",
    "scd2_rebuild", "scd2_snapshot",
    "watermark_filter", "max_watermark",
    "row_count_compare", "pk_integrity", "checksum_compare",
    "not_null_violations", "unique_violations", "relationship_violations",
    "accepted_values_violations", "between_violations", "preflight_guard",
]
