"""Source/sink round trips for every supported format, plus the clustered
parquet write path the migration job uses."""

import pytest
from pyspark.sql import functions as F

from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import ld
from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources.registry import (
    read_table,
    write_table,
)


@pytest.fixture()
def sample(spark, sf_dir):
    return ld(spark, sf_dir, "nation")


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_round_trip(spark, sample, tmp_path, fmt):
    path = str(tmp_path / fmt)
    write_table(sample, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt,
                      schema=sample.schema if fmt in ("json", "csv") else None)
    assert back.count() == sample.count()
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, sample.collect()))


def test_unknown_format_rejected(spark, sample, tmp_path):
    with pytest.raises(ValueError):
        read_table(spark, str(tmp_path), fmt="avro")


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "part_events")
    df = ld(spark, sf_dir, "customer")
    write_table(df, path, partition_by=["c_mktsegment"])
    back = read_table(spark, path)
    assert back.count() == df.count()
    # partition pruning: filtering on the partition column reads 1 dir
    seg = df.select("c_mktsegment").first()[0]
    filtered = back.filter(F.col("c_mktsegment") == seg)
    files = {r[0] for r in
             filtered.select(F.input_file_name()).distinct().collect()}
    assert all(f"c_mktsegment={seg}" in f for f in files)


def test_sorted_write_yields_tight_footers(spark, sf_dir, tmp_path):
    path = str(tmp_path / "sorted_li")
    df = ld(spark, sf_dir, "lineitem").repartition(4)
    write_table(df, path, sort_by=["l_orderkey"])
    import pyarrow.parquet as pq
    import glob

    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = [md.schema.column(i).name
                   for i in range(md.num_columns)].index("l_orderkey")
        rg = md.row_group(0).column(col_idx).statistics
        ranges.append((rg.min, rg.max))
    assert len(ranges) >= 2
    # sorted-within-partition files have non-degenerate (min,max) windows
    assert all(mn <= mx for mn, mx in ranges)


class TestIcebergCapabilityPath:
    """write_table_v2 dispatch: Iceberg writeTo when a catalog is live,
    partitioned parquet otherwise (this environment has no iceberg jar, so
    the live-catalog case is pinned at the branch-selection level with a
    loadable stand-in class — the decision logic is what's testable here)."""

    def test_no_catalog_configured_falls_back(self, spark, sample, tmp_path):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources.registry import (
            choose_write_branch,
            write_table_v2,
        )

        assert choose_write_branch(spark, "db.nation", catalog="nope") == "file"
        path = str(tmp_path / "v2_fallback")
        branch = write_table_v2(spark, sample, path, table_ident="db.nation",
                                catalog="nope")
        assert branch == "parquet"
        assert read_table(spark, path).count() == sample.count()

    def test_unloadable_impl_is_not_available(self, spark):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources.registry import (
            iceberg_catalog_available,
        )

        spark.conf.set("spark.sql.catalog.ghost",
                       "org.apache.iceberg.spark.SparkCatalog")  # jar absent
        try:
            assert not iceberg_catalog_available(spark, "ghost")
        finally:
            spark.conf.unset("spark.sql.catalog.ghost")

    def test_loadable_impl_selects_iceberg_branch(self, spark):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources.registry import (
            choose_write_branch,
        )

        # any JVM-loadable class proves the classpath check fires; the real
        # deployment sets org.apache.iceberg.spark.SparkCatalog here
        spark.conf.set("spark.sql.catalog.fake",
                       "org.apache.spark.sql.SparkSession")
        try:
            assert choose_write_branch(spark, "db.t", catalog="fake") \
                == "iceberg"
            # no table ident -> file branch even with a live catalog
            assert choose_write_branch(spark, None, catalog="fake") == "file"
        finally:
            spark.conf.unset("spark.sql.catalog.fake")


class TestPythonDataSource:
    def test_partitioned_deterministic_generation(self, spark):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources import (
            pydatasource,
        )

        pydatasource.register(spark)
        a = (spark.read.format("eventsgen")
             .option("n", 1000).option("parts", 8).load())
        assert a.rdd.getNumPartitions() == 8
        assert a.count() == 1000
        # same rows regardless of partition layout
        b = (spark.read.format("eventsgen")
             .option("n", 1000).option("parts", 3).load())
        assert (sorted(r.event_id for r in a.collect())
                == sorted(r.event_id for r in b.collect()))
        ra = {r.event_id: (r.user_id, r.event_type, r.value)
              for r in a.collect()}
        rb = {r.event_id: (r.user_id, r.event_type, r.value)
              for r in b.collect()}
        assert ra == rb


class TestJdbcPartitionedRead:
    """End-to-end partitioned JDBC evidence against embedded Derby (the
    JDBC engine Spark already ships for its Hive metastore — no external
    service). This is the 'Spark read DB2' path of BASELINE.json with a
    real driver: jdbc_reader's option assembly must produce a read that
    (a) returns the written rows and (b) actually splits into
    numPartitions stride queries on the partition column."""

    @pytest.fixture()
    def derby_url(self, spark, sf_dir, tmp_path):
        url = f"jdbc:derby:{tmp_path}/jdbcdb;create=true"
        src = (spark.read.parquet(f"{sf_dir}/customer.parquet")
               .limit(200))
        (src.write.format("jdbc")
         .option("url", url)
         .option("dbtable", "CUSTOMER")
         .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
         .mode("overwrite").save())
        return url, src

    def test_partitioned_read_round_trips(self, spark, derby_url):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources.migrate import (
            jdbc_reader,
        )

        url, src = derby_url
        lo, hi = (src.agg(F.min("c_custkey"), F.max("c_custkey"))
                  .first())
        got = jdbc_reader(
            spark, url, "CUSTOMER",
            partition_column="c_custkey",
            lower_bound=int(lo), upper_bound=int(hi) + 1,
            num_partitions=4,
            driver="org.apache.derby.jdbc.EmbeddedDriver").load()
        # partition evidence: the scan splits into the requested strides
        assert got.rdd.getNumPartitions() == 4
        want = {(r.c_custkey, r.c_name) for r in src.collect()}
        have = {(r.c_custkey, r.c_name) for r in got.collect()}
        assert have == want

    def test_unpartitioned_needs_no_bounds(self, spark, derby_url):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources.migrate import (
            jdbc_reader,
        )

        url, src = derby_url
        got = jdbc_reader(
            spark, url, "CUSTOMER",
            driver="org.apache.derby.jdbc.EmbeddedDriver").load()
        assert got.rdd.getNumPartitions() == 1
        assert got.count() == src.count()

    def test_bounds_are_mandatory_with_partition_column(self, spark):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources.migrate import (
            jdbc_reader,
        )

        with pytest.raises(ValueError, match="bounds"):
            jdbc_reader(spark, "jdbc:derby:memory:x", "T",
                        partition_column="ID")


class TestIcebergWriteInvocation:
    """The Iceberg branch's exact writeTo invocation, pinned without the
    runtime jar: a recording stand-in DataFrame captures every call the
    branch makes, so the ONLY thing this environment leaves unexercised is
    the jar itself — not the code path (reference intent:
    converter.py:155-163, partitioned Iceberg DDL)."""

    def test_iceberg_branch_builds_exact_writer_chain(self, spark,
                                                      monkeypatch):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources import (
            registry,
        )

        rec = {"options": {}}

        class RecordingWriter:
            def option(self, k, v):
                rec["options"][k] = v
                return self

            def partitionedBy(self, *cols):
                rec["partitioned_by"] = [str(c) for c in cols]
                return self

            def createOrReplace(self):
                rec["created"] = True

        class RecordingDF:
            def sortWithinPartitions(self, *cols):
                rec["sorted_by"] = list(cols)
                return self

            def writeTo(self, ident):
                rec["ident"] = ident
                return RecordingWriter()

        monkeypatch.setattr(registry, "choose_write_branch",
                            lambda *a, **k: "iceberg")
        branch = registry.write_table_v2(
            spark, RecordingDF(), path="/unused",
            table_ident="db.events", catalog="ice",
            partition_by=["day", "event_type"], sort_by=["ts"],
            **{"write.target-file-size-bytes": 134217728})

        assert branch == "iceberg"
        assert rec["ident"] == "ice.db.events"
        assert rec["sorted_by"] == ["ts"]          # sorted BEFORE writeTo
        # options stringified for the DSv2 writer
        assert rec["options"] == {
            "write.target-file-size-bytes": "134217728"}
        # hidden-partitioning spec: one Column per partition key, in order
        assert [c for c in rec["partitioned_by"]] == [
            "Column<'day'>", "Column<'event_type'>"]
        assert rec["created"] is True

    def test_iceberg_branch_skips_partitioning_when_unpartitioned(
            self, spark, monkeypatch):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources import (
            registry,
        )

        calls = []

        class RecordingWriter:
            def partitionedBy(self, *cols):
                calls.append("partitionedBy")
                return self

            def option(self, k, v):
                calls.append("option")
                return self

            def createOrReplace(self):
                calls.append("createOrReplace")

        class RecordingDF:
            def sortWithinPartitions(self, *cols):
                calls.append("sort")
                return self

            def writeTo(self, ident):
                calls.append(f"writeTo:{ident}")
                return RecordingWriter()

        monkeypatch.setattr(registry, "choose_write_branch",
                            lambda *a, **k: "iceberg")
        registry.write_table_v2(spark, RecordingDF(), path="/unused",
                                table_ident="db.t", catalog="ice")
        assert calls == ["writeTo:ice.db.t", "createOrReplace"]
