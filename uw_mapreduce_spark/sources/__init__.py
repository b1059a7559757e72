from .tables import TABLE_NAMES, load_table, load_tables, register_views
from .text_kv import read_text_kv, write_text_kv

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "read_text_kv",
    "write_text_kv",
]
