from .csv import read_csv_stringly, write_csv, write_csv_single
from .jsonl import read_jsonl, read_orc, write_jsonl, write_orc
from .parquet import load_tables, read_table

__all__ = [
    "read_csv_stringly",
    "write_csv",
    "write_csv_single",
    "read_jsonl",
    "write_jsonl",
    "read_orc",
    "write_orc",
    "load_tables",
    "read_table",
]
