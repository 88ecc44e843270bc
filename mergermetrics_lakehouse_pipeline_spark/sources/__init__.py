from .catalog import (
    copy_into,
    create_view,
    drop_table,
    table_exists,
    write_table,
)
from .csv import archive_landing_files, read_csv_with_lineage
from .delta_log import (
    DeltaProtocolError,
    delete_delta,
    last_txn_version,
    optimize_delta,
    overwrite_partitions_delta,
    read_delta,
    read_delta_pruned,
    snapshot,
    stream_commit_batches,
    vacuum_delta,
    write_checkpoint,
    write_delta,
)

__all__ = [
    "archive_landing_files",
    "read_csv_with_lineage",
    "copy_into",
    "create_view",
    "drop_table",
    "table_exists",
    "write_table",
    "DeltaProtocolError",
    "delete_delta",
    "last_txn_version",
    "optimize_delta",
    "overwrite_partitions_delta",
    "read_delta",
    "read_delta_pruned",
    "snapshot",
    "stream_commit_batches",
    "vacuum_delta",
    "write_checkpoint",
    "write_delta",
]
