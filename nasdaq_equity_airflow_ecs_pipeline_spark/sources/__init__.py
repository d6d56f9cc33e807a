from .tables import load_table, load_tables, TESTDATA_TABLES
from .jsonl import read_quotes_jsonl, write_quotes_jsonl
from .inline import build_dim_date_frame, build_dim_exchange_frame
from .mock import generate_mock_quotes

__all__ = [
    "load_table", "load_tables", "TESTDATA_TABLES",
    "read_quotes_jsonl", "write_quotes_jsonl",
    "build_dim_date_frame", "build_dim_exchange_frame",
    "generate_mock_quotes",
]
