from .parquet_store import ParquetEntry, ParquetStore

__all__ = ["ParquetStore", "ParquetEntry"]
