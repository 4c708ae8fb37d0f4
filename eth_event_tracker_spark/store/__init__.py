from .inmem_store import InMemEntry, InMemStore
from .jdbc_store import JdbcEntry, JdbcStore
from .parquet_store import ParquetEntry, ParquetStore
from .sql_store import SqlEntry, SqlStore

__all__ = [
    "InMemEntry",
    "InMemStore",
    "JdbcEntry",
    "JdbcStore",
    "ParquetEntry",
    "ParquetStore",
    "SqlEntry",
    "SqlStore",
]
