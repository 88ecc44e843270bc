from .merge import insert_only, merge_dataframes, upsert_all, upsert_mapped
from .incremental import affected_periods, recompute_affected_periods

__all__ = [
    "insert_only",
    "merge_dataframes",
    "upsert_all",
    "upsert_mapped",
    "affected_periods",
    "recompute_affected_periods",
]
