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


def _scratch_dir(prefix: str) -> str:
    """mkdtemp that cleans itself up at interpreter exit. The sink demos
    write real table copies; without this every registry sweep / bench
    rep would permanently leak a copy of the events table into /tmp."""
    import atexit
    import shutil
    import tempfile

    path = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


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


def iceberg_catalog_available(spark: SparkSession,
                              catalog: str = "iceberg") -> bool:
    """Capability check for a live Iceberg catalog on this session.

    True only when ``spark.sql.catalog.<catalog>`` is configured AND its
    implementation class actually loads on the JVM classpath — a config
    key alone proves nothing (this environment has no iceberg-spark
    runtime jar, so here this is always False and the parquet fallback is
    the tested default; on a real cluster the standard
    ``--packages org.apache.iceberg:iceberg-spark-runtime...`` +
    ``spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog``
    setup flips the branch).
    """
    impl = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    if not impl:
        return False
    try:
        spark._jvm.java.lang.Class.forName(impl)
        return True
    except Exception:
        return False


def choose_write_branch(spark: SparkSession, table_ident: str | None,
                        catalog: str = "iceberg") -> str:
    """Dispatch decision for ``write_table_v2``: 'iceberg' when the caller
    named a catalog table and the Iceberg catalog is actually live,
    'file' otherwise. Split out so the branch logic is testable without
    an Iceberg runtime."""
    if table_ident and iceberg_catalog_available(spark, catalog):
        return "iceberg"
    return "file"


def write_table_v2(spark: SparkSession, df: DataFrame, path: str,
                   table_ident: str | None = None, catalog: str = "iceberg",
                   fmt: str = "parquet",
                   partition_by: list[str] | None = None,
                   sort_by: list[str] | None = None, **options) -> str:
    """Write via the DataSourceV2 Iceberg path when available, else the
    file path — returns the branch taken ('iceberg' or the file format).

    The Iceberg branch is ``writeTo(catalog.table).partitionedBy(...)
    .createOrReplace()``: hidden-partitioning DDL, snapshot isolation, and
    compaction-friendly metadata — what ``convert.py``'s emitted DDL
    promises, executed for real when the runtime jar is present. The
    fallback keeps identical row-level semantics (hive-style partitioned
    parquet + within-partition sort for file-stat clustering).
    """
    from pyspark.sql import functions as F

    if choose_write_branch(spark, table_ident, catalog) == "iceberg":
        if sort_by:
            df = df.sortWithinPartitions(*sort_by)
        writer = df.writeTo(f"{catalog}.{table_ident}")
        for k, v in options.items():
            writer = writer.option(k, str(v))
        if partition_by:
            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        writer.createOrReplace()
        return "iceberg"
    write_table(df, path, fmt=fmt, partition_by=partition_by,
                sort_by=sort_by, **options)
    return fmt


def source_roundtrip_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable connector exercise: the same orders slice written
    through each non-parquet format (csv with header+inference, json, orc)
    and read back must aggregate to identical numbers — proving the
    read/write codepaths, not just parquet. Doubles survive the text
    formats because Spark serializes them round-trippably and the decimal
    protocol quantizes identically afterwards.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    src = (spark.read.parquet(f"{sf_dir}/orders.parquet")
           .filter(F.col("o_orderkey") <= 4000)
           .select("o_orderkey", "o_custkey", "o_totalprice",
                   "o_orderpriority"))
    if src.limit(1).count() == 0:
        raise ValueError(
            "source_roundtrip_formats: empty orders slice — the text "
            "formats lose their schema on an empty write (csv inference "
            "has nothing to infer), so the round-trip cannot be "
            "demonstrated on zero rows (empty-input contract: loud "
            "typed error)")
    per_fmt = []
    for fmt in ("csv", "json", "orc"):
        path = _scratch_dir(f"roundtrip_{fmt}_")
        write_table(src, path, fmt=fmt)
        back = read_table(spark, path, fmt=fmt,
                          **({"inferSchema": "true"} if fmt == "csv" else {}))
        per_fmt.append(back.agg(
            F.lit(fmt).alias("fmt"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct("o_custkey").alias("n_custs"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("double").alias("total_price"),
            F.max("o_orderpriority").alias("max_priority")))
    return reduce(lambda a, b: a.unionByName(b), per_fmt).orderBy("fmt")


ORACLE_SOURCE_ROUNDTRIP = """
WITH base AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(DISTINCT o_custkey) AS n_custs,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
           AS total_price,
         MAX(o_orderpriority) AS max_priority
  FROM orders WHERE o_orderkey <= 4000
)
SELECT fmt, n_rows, n_custs, total_price, max_priority
FROM (SELECT 'csv' AS fmt UNION ALL SELECT 'json' UNION ALL SELECT 'orc'),
     base
ORDER BY fmt
"""


def sink_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned sink + partition-pruned read-back: events written
    ``partitionBy(day)``, then one day's slice aggregated from the
    partitioned copy. The read plan carries the day predicate as a
    PartitionFilters entry (pinned in tests/test_plans.py) — at 100 TB
    this is THE scan lever: the query touches one partition directory,
    not the table.

    The probed day is the dataset's third day, discovered with one
    bounded scalar aggregate (a 1-row collect, same class as the pivot
    value scan — documented driver-side bound). Output aggregates follow
    the decimal protocol, so the oracle (same filter on the raw table)
    matches bitwise.
    """
    import datetime

    from pyspark.sql import functions as F

    from ..operators.relational import DEC, load_events

    e = load_events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    path = _scratch_dir("sink_part_")
    write_table(e, path, partition_by=["day"], sort_by=["ts"])
    # bounded scalar: min(day) is one row; the +2 offset keeps the probe
    # inside the data range on every fixture regeneration
    min_day = e.agg(F.min("day")).collect()[0][0]
    if min_day is None:
        raise ValueError(
            "sink_partitioned_prune: empty events feed — a partitioned "
            "write/prune round-trip cannot be demonstrated on zero rows "
            "(empty-input contract: loud typed error, not a deep "
            "TypeError; found by the r9 empty probe)")
    probe = min_day + datetime.timedelta(days=2)
    back = spark.read.parquet(path).filter(F.col("day") == F.lit(probe))
    return (back.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast(DEC)).cast("double")
                 .alias("total_value"))
            .orderBy("event_type"))


ORACLE_SINK_PARTITIONED = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events
WHERE CAST(ts AS DATE) = (SELECT MIN(CAST(ts AS DATE)) + 2 FROM events)
GROUP BY event_type
ORDER BY event_type
"""


def sink_dynamic_partition_overwrite(spark: SparkSession,
                                     sf_dir: str) -> DataFrame:
    """Surgical partition replacement: events land hive-partitioned by
    day; a restatement batch for ONE day (its values doubled) is then
    written with ``partitionOverwriteMode=dynamic``, which replaces only
    the partitions present in the incoming frame and leaves every other
    day's files untouched — the lakehouse restatement/backfill pattern
    (static overwrite mode would truncate the whole table; at 100 TB the
    difference is rewriting one day vs. the world).

    The read-back aggregates per day under the decimal protocol; the
    oracle applies the same one-day restatement as a CASE expression over
    the raw table, so a mismatch means the overwrite leaked beyond (or
    missed) its partition.
    """
    import datetime

    from pyspark.sql import functions as F

    from ..operators.relational import DEC, load_events

    e = load_events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    path = _scratch_dir("sink_dynpart_")
    write_table(e, path, partition_by=["day"])
    # bounded scalar (1-row min) to pick a restatement day inside the
    # data range on every fixture regeneration
    min_day = e.agg(F.min("day")).collect()[0][0]
    if min_day is None:
        raise ValueError(
            "sink_dynamic_partition_overwrite: empty events feed — a "
            "partition restatement cannot be demonstrated on zero rows "
            "(empty-input contract: loud typed error)")
    restate_day = min_day + datetime.timedelta(days=1)
    restated = (e.filter(F.col("day") == F.lit(restate_day))
                .withColumn("value", F.col("value") * 2))
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                               "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        restated.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    back = spark.read.parquet(path)
    return (back.groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast(DEC)).cast("double")
                 .alias("total_value"))
            .orderBy("day"))


ORACLE_SINK_DYNPART = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(CASE WHEN CAST(ts AS DATE) =
                               (SELECT MIN(CAST(ts AS DATE)) + 1 FROM events)
                          THEN value * 2 ELSE value END
                     AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY CAST(ts AS DATE)
ORDER BY day
"""


def compact_small_files(spark: SparkSession, src_path: str, dst_path: str,
                        target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Small-file compaction: rewrite a directory of many small parquet
    files into few near-target-size files (the OPTIMIZE/compaction
    maintenance pass every streaming or incremental sink eventually
    needs — a 100 TB table fed by micro-batches degrades into millions
    of KB-files whose open/footer costs dominate scans).

    File count = ceil(total_bytes / target): computed from the source
    listing, executed with coalesce (narrow — no shuffle; compaction
    must not pay a full exchange just to merge files). Returns the
    number of output files written.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(src_path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(src_path)
    df.coalesce(n_out).write.mode("overwrite").parquet(dst_path)
    return sum(f.endswith(".parquet") for _r, _d, fs in os.walk(dst_path)
               for f in fs)


def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry face of ``compact_small_files``: fragment the events
    table into 64 small files, compact back, and aggregate the compacted
    copy — the oracle (same aggregate over the raw table) proves the
    rewrite is content-preserving, and the pytest pins the file-count
    collapse.
    """
    from pyspark.sql import functions as F

    from ..operators.relational import DEC, load_events

    frag = _scratch_dir("compact_src_")
    out = _scratch_dir("compact_dst_")
    e = load_events(spark, sf_dir)
    e.repartition(64).write.mode("overwrite").parquet(frag)
    compact_small_files(spark, frag, out)
    back = spark.read.parquet(out)
    return (back.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast(DEC)).cast("double")
                 .alias("total_value"))
            .orderBy("event_type"))


ORACLE_SINK_COMPACT = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on read: two parquet batches with DIFFERENT
    schemas (the second adds a column — the standard additive evolution
    a long-lived ingest path accumulates) read back as ONE DataFrame via
    ``mergeSchema``; rows from the old batch surface the new column as
    NULL. The oracle reproduces the same union with explicit NULL
    padding, so the driver check pins Spark's merge semantics exactly.
    """
    from pyspark.sql import functions as F

    path = _scratch_dir("schema_evo_")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # split point relative to the key range so both batches are non-empty
    # at every fixture scale (bounded 1-row scalar, documented pattern)
    mid = o.agg(F.expr("max(o_orderkey) div 2")).collect()[0][0]
    batch1 = (o.filter(F.col("o_orderkey") <= mid)
              .select("o_orderkey", "o_custkey"))
    batch2 = (o.filter(F.col("o_orderkey") > mid)
              .select("o_orderkey", "o_custkey", "o_orderpriority"))
    batch1.write.mode("overwrite").parquet(f"{path}/b=1")
    batch2.write.mode("overwrite").parquet(f"{path}/b=2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/b=1", f"{path}/b=2")
    return (merged.groupBy(
        F.coalesce("o_orderpriority", F.lit("<pre-evolution>"))
        .alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.sum("o_custkey").alias("custkey_sum"))
        .orderBy("priority"))


ORACLE_SCHEMA_EVOLUTION = """
WITH mid AS (SELECT MAX(o_orderkey) // 2 AS m FROM orders),
merged AS (
  SELECT o_orderkey, o_custkey, NULL AS o_orderpriority
  FROM orders, mid WHERE o_orderkey <= m
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderpriority
  FROM orders, mid WHERE o_orderkey > m
)
SELECT COALESCE(o_orderpriority, '<pre-evolution>') AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(o_custkey) AS BIGINT) AS custkey_sum
FROM merged
GROUP BY priority
ORDER BY priority
"""


def dpp_star_join_parts(spark: SparkSession, sf_dir: str):
    """Build the star-join halves for ``source_dpp_star_join``: the
    events fact hive-partitioned by day on scratch, and a day-dimension
    (day, day_of_week) ALSO materialized to parquet — through a file
    source, not an in-memory relation, so Catalyst cannot constant-fold
    the dim filter into a static partition predicate and must plan the
    runtime DPP subquery. Split out so the plan test can assert on the
    pre-aggregation join. Returns (fact_df, filtered_dim_df).
    """
    from pyspark.sql import functions as F

    from ..operators.relational import load_events

    e = load_events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    if e.limit(1).count() == 0:
        raise ValueError(
            "dpp_star_join_parts: empty events feed — an empty "
            "hive-partitioned write leaves no footers to re-read, so the "
            "DPP star join cannot be demonstrated on zero rows "
            "(empty-input contract: loud typed error)")
    path = _scratch_dir("dpp_star_")
    write_table(e, f"{path}/fact", partition_by=["day"], sort_by=["ts"])
    dim = (e.select("day").distinct()
           .withColumn("dow", F.dayofweek("day")))
    dim.coalesce(1).write.mode("overwrite").parquet(f"{path}/dim")
    fact = spark.read.parquet(f"{path}/fact")
    # Spark dayofweek: 1=Sunday..7=Saturday → 2 = Monday
    dim_mon = spark.read.parquet(f"{path}/dim").filter(F.col("dow") == 2)
    return fact, dim_mon


def source_dpp_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning over a star join: the fact table is
    hive-partitioned by day; the filter ("Mondays only") lives on the DAY
    DIMENSION, not the fact — so static partition pruning can't help.
    Spark plans a DPP subquery instead: the broadcast built for the dim
    side is REUSED as a runtime partition filter on the fact scan
    (``dynamicpruningexpression`` in PartitionFilters, pinned in
    tests/test_plans.py), and only the matching day directories are read.

    At 100 TB this is the difference between scanning ~1/7th of the fact
    and scanning all of it: the dim predicate prunes fact PARTITIONS at
    runtime with zero extra passes (reuseBroadcastOnly — the dim
    broadcast was being built for the join anyway).

    The oracle applies the equivalent weekday predicate directly (DuckDB
    ``dayofweek``: 0=Sunday..6 — Monday is 1 there, 2 in Spark).
    """
    from pyspark.sql import functions as F

    from ..operators.relational import DEC

    fact, dim_mon = dpp_star_join_parts(spark, sf_dir)
    return (fact.join(F.broadcast(dim_mon), "day")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast(DEC)).cast("double")
                 .alias("total_value"))
            .orderBy("event_type"))


ORACLE_DPP_STAR_JOIN = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
FROM events
WHERE dayofweek(CAST(ts AS DATE)) = 1
GROUP BY event_type
ORDER BY event_type
"""


def source_bloom_runtime_filter(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Selective fact–dim join shaped for Spark's RUNTIME BLOOM FILTER
    injection — the row-level complement to ``source_dpp_star_join``'s
    partition-level pruning: the selective predicate lives on the orders
    side ('P' status ≈ a few % of rows), so at 100 TB the optimizer's
    InjectRuntimeFilter rule builds a bloom filter from the filtered
    creation side and pushes ``might_contain(xxhash64(l_orderkey))``
    into the lineitem scan — most fact rows die at the scan instead of
    crossing the shuffle.

    No session conf is touched here: with DEFAULT thresholds the rule
    engages exactly when it should — creation side under 10 MB,
    application-side scan over 10 GB, i.e. the 100 TB deployment, not
    the KB-scale fixture. The pytest scales the thresholds to fixture
    size (the AQE-skew-test pattern) and pins ``might_contain`` in the
    executed plan, so the injection path itself is regression-guarded.

    The merge hint forces the shuffle-join shape the rule targets (a
    broadcast dim already row-filters by virtue of the hash probe).
    """
    from pyspark.sql import functions as F

    from ..operators.relational import DEC, ld

    li = ld(spark, sf_dir, "lineitem", fanout=False).select(
        "l_orderkey", "l_quantity", "l_extendedprice")
    o = (ld(spark, sf_dir, "orders", fanout=False)
         .filter(F.col("o_orderstatus") == "P")
         .select(F.col("o_orderkey").alias("l_orderkey")))
    return (li.join(o.hint("merge"), "l_orderkey")
            .groupBy()
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("l_quantity").cast(DEC)).cast("double")
                 .alias("sum_qty"),
                 F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
                 .alias("sum_price")))


ORACLE_BLOOM_RUNTIME_FILTER = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
         AS sum_price
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'P'
"""
