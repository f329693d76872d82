"""Sources & sinks: parquet/csv/json/text readers, JDBC (DB2) partitioned
reads, and the migration writer (Iceberg when available, Parquet fallback)."""

from .registry import read_table, write_table
from .migrate import migrate_table, jdbc_reader

__all__ = ["read_table", "write_table", "migrate_table", "jdbc_reader"]
