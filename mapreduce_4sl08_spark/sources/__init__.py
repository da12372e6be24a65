from .tables import TABLE_NAMES, load_table, load_tables, register_views
from .io import read_any, write_any

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "read_any",
    "write_any",
]
