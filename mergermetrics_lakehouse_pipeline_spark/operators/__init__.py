from .merge import insert_only, merge_dataframes, upsert_all, upsert_mapped
from .incremental import affected_periods, recompute_affected_periods
from .cdc import snapshot_diff
from .ivm import aggregate_batch, merge_aggregates
from .layout import zorder_key, zorder_write
from .quality import (
    Expectation,
    check_expectations,
    fk_violations,
    partition_checksums,
)
from .rangejoin import bin_interval_join

__all__ = [
    "insert_only",
    "merge_dataframes",
    "upsert_all",
    "upsert_mapped",
    "affected_periods",
    "recompute_affected_periods",
    "snapshot_diff",
    "aggregate_batch",
    "merge_aggregates",
    "zorder_key",
    "zorder_write",
    "Expectation",
    "check_expectations",
    "fk_violations",
    "partition_checksums",
    "bin_interval_join",
]
