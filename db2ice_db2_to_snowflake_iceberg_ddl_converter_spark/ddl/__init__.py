"""DDL dialect parsers (driver-side; schema artifacts are KB-scale)."""

from .db2_parser import DB2DdlParser
from .snowflake_parser import SnowflakeDdlParser

__all__ = ["DB2DdlParser", "SnowflakeDdlParser"]
