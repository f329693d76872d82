"""Bridge from the schema plane to Spark: StructTypes, cast plans, and the
schema-catalog / issues DataFrames.

This is where the reference's driver-side objects become data-plane
parameters (SURVEY.md §1.4): a parsed ``TableDef`` turns into
- a ``StructType`` for reads/writes,
- a list of ``cast`` expressions for the migration job (sources/migrate.py),
- rows of a ``schema_catalog`` DataFrame (one row per column) so that the
  reference's assessment aggregations (assessor.py:186-274) can also run as
  ordinary ``groupBy().agg()`` over a catalog of millions of columns.

Iceberg target-type strings (mapper.py:43-52) map to Spark types as follows;
TIME(6) has no Spark type, so it becomes microseconds-since-midnight LongType
(documented deviation, SURVEY.md §7.3).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .mapping import map_db2_type
from .model import ConversionStatus, TableDef

_NUMBER_RE = re.compile(r"NUMBER\((\d+),(\d+)\)")


def spark_type_for(target_type: str) -> T.DataType:
    """Iceberg-compatible target type string → Spark DataType."""
    t = target_type.upper()
    if t == "INTEGER":
        return T.IntegerType()
    if t == "BIGINT":
        return T.LongType()
    if t == "FLOAT":
        return T.FloatType()
    if t == "DOUBLE":
        return T.DoubleType()
    if t == "STRING" or t == "VARCHAR":
        return T.StringType()
    if t == "BINARY":
        return T.BinaryType()
    if t == "DATE":
        return T.DateType()
    if t == "BOOLEAN":
        return T.BooleanType()
    if t.startswith("TIMESTAMP_LTZ"):
        return T.TimestampType()            # session-TZ semantics
    if t.startswith("TIMESTAMP"):
        return T.TimestampNTZType()         # NTZ, µs precision — lossless
    if t.startswith("TIME"):
        return T.LongType()                 # µs since midnight (no TimeType)
    m = _NUMBER_RE.match(t)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    return T.StringType()


def struct_type_for(table: TableDef) -> T.StructType:
    """TableDef → StructType with provenance metadata per field."""
    fields = []
    for col in table.columns:
        mapping = map_db2_type(col.data_type, col.length, col.precision,
                               col.scale, col.for_bit_data, col.ccsid)
        meta = {"source_type": mapping.source_type,
                "conversion_status": mapping.status.value}
        if mapping.ewi_code:
            meta["ewi_code"] = mapping.ewi_code
        if col.default is not None:
            meta["default"] = col.default
        if col.generated:
            meta["generated"] = col.generated
        if col.ccsid:
            meta["ccsid"] = col.ccsid
        if col.fieldproc:
            meta["fieldproc"] = col.fieldproc
        fields.append(T.StructField(col.name, spark_type_for(mapping.target_type),
                                    col.nullable, metadata=meta))
    return T.StructType(fields)


def cast_plan(table: TableDef) -> list:
    """Per-column Catalyst cast expressions for the migration job.

    All native ``cast`` calls — no Python UDFs — so whole-stage codegen stays
    intact on the 100 TB path. Column resolution is case-insensitive (DB2
    identifiers are upper-cased; source files are often lower-cased).
    """
    exprs = []
    for col in table.columns:
        mapping = map_db2_type(col.data_type, col.length, col.precision,
                               col.scale, col.for_bit_data, col.ccsid)
        exprs.append(F.col(col.name).cast(spark_type_for(mapping.target_type))
                     .alias(col.name))
    return exprs


_CATALOG_SCHEMA = T.StructType([
    T.StructField("table_schema", T.StringType()),
    T.StructField("table_name", T.StringType()),
    T.StructField("column_name", T.StringType()),
    T.StructField("ordinal", T.IntegerType()),
    T.StructField("source_type", T.StringType()),
    T.StructField("base_type", T.StringType()),
    T.StructField("target_type", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("ewi_code", T.StringType()),
    T.StructField("nullable", T.BooleanType()),
    T.StructField("generated", T.StringType()),
    T.StructField("fieldproc", T.StringType()),
    T.StructField("table_editproc", T.StringType()),
    T.StructField("table_validproc", T.StringType()),
    T.StructField("partition_kind", T.StringType()),
    T.StructField("n_foreign_keys", T.IntegerType()),
    T.StructField("n_check_constraints", T.IntegerType()),
])


def schema_catalog_df(spark: SparkSession, tables: list[TableDef]) -> DataFrame:
    """Explode parsed tables into a one-row-per-column catalog DataFrame.

    This is the data-plane twin of the reference's per-table loop
    (assessor.py:217-252): once columns are rows, assessment is a groupBy.
    """
    rows = []
    for t in tables:
        n_fk = sum(1 for c in t.constraints if c.kind == "FOREIGN KEY")
        n_ck = sum(1 for c in t.constraints if c.kind == "CHECK")
        pkind = t.partition.kind if t.partition else None
        for i, col in enumerate(t.columns):
            m = map_db2_type(col.data_type, col.length, col.precision,
                             col.scale, col.for_bit_data, col.ccsid)
            rows.append((t.schema, t.name, col.name, i, m.source_type,
                         col.data_type.split("(")[0].strip(), m.target_type,
                         m.status.value, m.ewi_code, col.nullable,
                         col.generated, col.fieldproc, t.editproc, t.validproc,
                         pkind, n_fk, n_ck))
    return spark.createDataFrame(rows, schema=_CATALOG_SCHEMA)


def assess_catalog(catalog: DataFrame) -> DataFrame:
    """Assessment as DataFrame aggregation — per-table readiness from the
    schema catalog, mirroring the penalty model (assessor.py:167-180, :427).

    One shuffle on (table_schema, table_name); at catalog scale the keys are
    near-unique so AQE coalescing keeps this cheap. Returns one row per table:
    column counts, penalty total, readiness score and traffic-light level.
    """
    st = F.col("status")
    col_penalty = (
        F.when(st == ConversionStatus.UNSUPPORTED.value, 25)
        .when(st == ConversionStatus.LOSSY.value, 10)
        .when((st == ConversionStatus.COMPATIBLE.value)
              & F.col("ewi_code").isNotNull(), 2)
        .otherwise(0)
        + F.when(F.col("fieldproc").isNotNull(), 50).otherwise(0)
        + F.when(F.col("generated").isNotNull(), 15).otherwise(0)
    )
    per_table = (
        catalog
        .groupBy("table_schema", "table_name")
        .agg(
            F.count("*").alias("n_columns"),
            F.sum(col_penalty).alias("column_penalty"),
            F.max(F.when(F.col("table_editproc").isNotNull(), 50).otherwise(0))
             .alias("editproc_penalty"),
            F.max(F.when(F.col("table_validproc").isNotNull(), 40).otherwise(0))
             .alias("validproc_penalty"),
            F.max(F.when(F.col("partition_kind") == "HASH", 20).otherwise(0))
             .alias("partition_penalty"),
            (F.first("n_foreign_keys") * 5).alias("fk_penalty"),
            (F.first("n_check_constraints") * 5).alias("check_penalty"),
            F.max((st == ConversionStatus.UNSUPPORTED.value).cast("int"))
             .alias("has_unsupported"),
            F.max(F.col("fieldproc").isNotNull().cast("int")).alias("has_fieldproc"),
        )
        .withColumn("penalty_total",
                    F.col("column_penalty") + F.col("editproc_penalty")
                    + F.col("validproc_penalty") + F.col("partition_penalty")
                    + F.col("fk_penalty") + F.col("check_penalty"))
        .withColumn("readiness_score",
                    F.greatest(F.lit(0), F.lit(100) - F.col("penalty_total")))
        .withColumn("readiness_level",
                    F.when(F.col("readiness_score") >= 80, "green")
                    .when(F.col("readiness_score") >= 50, "yellow")
                    .otherwise("red"))
        .withColumn("can_auto_convert",
                    (F.col("has_unsupported") + F.col("has_fieldproc")
                     + (F.col("editproc_penalty") > 0).cast("int")
                     + (F.col("validproc_penalty") > 0).cast("int")) == 0)
        .drop("has_unsupported", "has_fieldproc")
    )
    return per_table


def type_distribution(catalog: DataFrame) -> DataFrame:
    """Corpus-wide base-type histogram (assessor.py:290-292, :226-227)."""
    return catalog.groupBy("base_type").agg(F.count("*").alias("n")) \
                  .orderBy(F.desc("n"), "base_type")
