from .inmem_store import InMemEntry, InMemStore
from .parquet_store import ParquetEntry, ParquetStore
from .sql_store import SqlEntry, SqlStore

__all__ = [
    "InMemEntry",
    "InMemStore",
    "ParquetEntry",
    "ParquetStore",
    "SqlEntry",
    "SqlStore",
]
