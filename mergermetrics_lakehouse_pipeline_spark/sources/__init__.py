from .csv import archive_landing_files, read_csv_with_lineage
from .catalog import (
    copy_into,
    create_view,
    drop_table,
    table_exists,
    write_table,
)

__all__ = [
    "archive_landing_files",
    "read_csv_with_lineage",
    "copy_into",
    "create_view",
    "drop_table",
    "table_exists",
    "write_table",
]
