"""Format-dispatching read/write helpers.

The reference's only sources are in-memory DDL strings and uploaded files
(app.py:1269-1312); its sinks are DDL text / PDF / JSON downloads. This module
supplies the real data-plane connectors the Spark engine needs: columnar
parquet as the default (pushdown + vectorized reads), plus csv/json/orc/text,
all schema-explicit in production paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_READERS = ("parquet", "orc", "csv", "json", "text")


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: T.StructType | None = None, **options) -> DataFrame:
    """Read one table. Explicit schema avoids inference scans in production."""
    if fmt not in _READERS:
        raise ValueError(f"unsupported source format: {fmt}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).format(fmt).load(path)


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite", partition_by: list[str] | None = None,
                sort_by: list[str] | None = None, **options) -> None:
    """Write one table, optionally hive-partitioned by ``partition_by``.

    ``sort_by`` does a within-partition sort before write so that min/max
    footer stats make later scans prunable (poor-man's clustering — the
    CLUSTER BY intent when no Iceberg catalog is configured).
    """
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    if fmt == "csv":
        # mirror the reader's default so round trips are lossless
        options.setdefault("header", "true")
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)
