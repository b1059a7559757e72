from .tables import TABLE_NAMES, load_table, load_tables, register_views
from .ingest import read_binary_dir, read_csv_quarantine
from .sinks import (
    compact_small_files,
    overwrite_partitions,
    write_bucketed,
    write_table,
)
from .versioned import (
    list_versions,
    read_version,
    vacuum_versions,
    write_version,
)
from .text_kv import read_text_kv, write_text_kv

__all__ = [
    "overwrite_partitions",
    "list_versions",
    "read_binary_dir",
    "read_version",
    "vacuum_versions",
    "write_version",
    "TABLE_NAMES",
    "compact_small_files",
    "load_table",
    "load_tables",
    "register_views",
    "write_bucketed",
    "write_table",
    "read_csv_quarantine",
    "read_text_kv",
    "write_text_kv",
]
