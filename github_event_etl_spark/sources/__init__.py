from .tables import SCHEMAS, TABLE_NAMES, load_table, register_views
from .ndjson import read_ndjson, read_ndjson_with_corrupt
from .csv import read_csv

__all__ = [
    "SCHEMAS",
    "TABLE_NAMES",
    "load_table",
    "register_views",
    "read_ndjson",
    "read_ndjson_with_corrupt",
    "read_csv",
]
