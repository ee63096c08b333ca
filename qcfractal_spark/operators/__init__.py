from .keyed import bulk_get_ordered, insert_dedup_classify, upsert_classify
from .joins import semi_join_values, anti_join_keys, left_join_coalesce_count
from .graph import descendants, ancestors, relatives
from .topk import per_group_topk, priority_claim_topk
from .aggregates import (
    status_counts,
    grouped_counts,
    access_summary,
    argmin_per_group,
    group_map_agg,
    weighted_sum,
)
from .pivot import compile_values_pivot, properties_df

__all__ = [
    "bulk_get_ordered",
    "insert_dedup_classify",
    "upsert_classify",
    "semi_join_values",
    "anti_join_keys",
    "left_join_coalesce_count",
    "descendants",
    "ancestors",
    "relatives",
    "per_group_topk",
    "priority_claim_topk",
    "status_counts",
    "grouped_counts",
    "access_summary",
    "argmin_per_group",
    "group_map_agg",
    "weighted_sum",
    "compile_values_pivot",
    "properties_df",
]
