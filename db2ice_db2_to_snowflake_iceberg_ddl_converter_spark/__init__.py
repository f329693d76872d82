"""PySpark-native analytics engine with the capabilities of the reference
DB2/Snowflake → Iceberg DDL converter, re-architected Spark-first.

Layout:
- schema plane (driver-side pure Python): model, mapping, ddl.*, assess, convert
- data plane (executor-side DataFrame ops): catalog, sources, operators, streaming
"""

from .model import (
    AssessmentReport,
    ColumnDef,
    ConstraintDef,
    ConversionResult,
    ConversionStatus,
    Issue,
    PartitionSpec,
    ReadinessLevel,
    Severity,
    SnowflakeColumnDef,
    SnowflakeConversionResult,
    SnowflakeTableDef,
    TableAssessment,
    TableDef,
    TypeMapping,
)
from .mapping import map_db2_type

__all__ = [
    "AssessmentReport",
    "ColumnDef",
    "ConstraintDef",
    "ConversionResult",
    "ConversionStatus",
    "Issue",
    "PartitionSpec",
    "ReadinessLevel",
    "Severity",
    "SnowflakeColumnDef",
    "SnowflakeConversionResult",
    "SnowflakeTableDef",
    "TableAssessment",
    "TableDef",
    "TypeMapping",
    "map_db2_type",
]

__version__ = "0.1.0"
