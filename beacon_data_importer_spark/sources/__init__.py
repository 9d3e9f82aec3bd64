from .csv import read_csv_stringly, write_csv, write_csv_single
from .parquet import load_tables, read_table

__all__ = [
    "read_csv_stringly",
    "write_csv",
    "write_csv_single",
    "load_tables",
    "read_table",
]
