"""Integration-gated Iceberg round-trip: runs ONLY when the
iceberg-spark-runtime jar is on the session classpath; skips (does not
fail) in environments without it — this container ships no iceberg jar,
so here the suite records a skip and the partitioned-parquet fallback
stays the tested default (tests/test_sources.py pins the dispatch).

On a real deployment (``--packages org.apache.iceberg:
iceberg-spark-runtime-<ver>``), these tests exercise the full path the
reference's emitted DDL promises (app.py:763-913): DB2 CREATE TABLE →
parsed TableDef → ``migrate_table`` → a REAL Iceberg table written via
``writeTo(...).partitionedBy(...)`` → read back identical, partition
spec honored.
"""

from __future__ import annotations

import pytest

_SPARK_CATALOG = "org.apache.iceberg.spark.SparkCatalog"

_DDL = """
CREATE TABLE APP.SALES (
    SALE_ID BIGINT NOT NULL,
    REGION VARCHAR(16),
    AMOUNT DECIMAL(12,2),
    SALE_DATE DATE
) PARTITION BY RANGE (REGION) (STARTING 'A' ENDING 'Z' EVERY 1);
"""


@pytest.fixture(scope="module")
def iceberg_spark(spark, tmp_path_factory):
    """The shared session, with a local hadoop-type Iceberg catalog bound
    at runtime — or a skip when the runtime jar is absent. Catalogs are
    lazily instantiated, so ``spark.conf.set`` works on a live session."""
    try:
        spark._jvm.java.lang.Class.forName(_SPARK_CATALOG)
    except Exception:
        pytest.skip("iceberg-spark-runtime not on the classpath")
    warehouse = str(tmp_path_factory.mktemp("iceberg_wh"))
    spark.conf.set("spark.sql.catalog.ice", _SPARK_CATALOG)
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", warehouse)
    yield spark
    for k in ("spark.sql.catalog.ice", "spark.sql.catalog.ice.type",
              "spark.sql.catalog.ice.warehouse"):
        spark.conf.unset(k)


class TestIcebergRoundTrip:
    def _source(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, "EAST", 10.50, "2024-01-01"),
             (2, "WEST", 20.25, "2024-01-02"),
             (3, "EAST", 30.00, "2024-01-03")],
            "sale_id long, region string, amount double, sale_date string")
        src = str(tmp_path / "src")
        df.write.parquet(src)
        return src

    def test_migrate_table_writes_real_iceberg(self, iceberg_spark,
                                               tmp_path):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.ddl import (
            DB2DdlParser,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources.migrate import (
            migrate_table,
        )

        spark = iceberg_spark
        table = DB2DdlParser().parse(_DDL)[0]
        src = self._source(spark, tmp_path)
        casted = migrate_table(
            spark, table, src, str(tmp_path / "unused"),
            catalog="ice", table_ident="db.sales")

        back = spark.table("ice.db.sales")
        assert back.count() == 3
        got = {tuple(r) for r in back.select("SALE_ID", "REGION").collect()}
        assert got == {(1, "EAST"), (2, "WEST"), (3, "EAST")}
        # the DDL's RANGE(REGION) partition spec must reach the table
        spec = spark.sql("SELECT partition FROM ice.db.sales.files")
        assert spec.count() >= 1
        assert casted.columns == [c.name for c in table.columns]

    def test_snapshot_isolation_on_replace(self, iceberg_spark, tmp_path):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.ddl import (
            DB2DdlParser,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.sources.migrate import (
            migrate_table,
        )

        spark = iceberg_spark
        table = DB2DdlParser().parse(_DDL)[0]
        src = self._source(spark, tmp_path)
        for _ in range(2):          # createOrReplace twice → 2 snapshots
            migrate_table(spark, table, src, str(tmp_path / "unused2"),
                          catalog="ice", table_ident="db.sales2")
        snaps = spark.sql("SELECT * FROM ice.db.sales2.snapshots")
        assert snaps.count() >= 2
