"""Custom Spark 4 Python DataSource: a partitioned, deterministic synthetic
event generator (``format("eventsgen")``).

Engine-extensibility surface: the reference has fixed file inputs only;
a 100 TB pipeline also needs generator/connector sources, and Spark 4's
Python DataSource API is the idiomatic way to add one without a JVM build.
Design points the registry entry proves:

- **Partitioned**: ``parts`` input partitions, each generating its own id
  range — the source parallelizes like a real scan (no driver-side loop).
- **Deterministic**: every field is integer arithmetic on the row id
  (Knuth multiplicative hash for user assignment, LCG residue for value),
  so the SAME rows come back on every run, on any partition layout — and
  the DuckDB oracle regenerates them independently from
  ``generate_series``, making a *generator source* oracle-checkable.
- **No wall clock**: timestamps derive from the row id against a fixed
  epoch (a generator that called now() could never be verified).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("click", "view", "purchase")
_BASE_EPOCH = 1_700_000_000  # fixed: 2023-11-14T22:13:20Z


class EventsGenSource(DataSource):
    """``spark.read.format("eventsgen").option("n", N).option("parts", P)``."""

    @classmethod
    def name(cls) -> str:
        return "eventsgen"

    def schema(self) -> str:
        return ("event_id long, ts timestamp, user_id long, "
                "event_type string, value double")

    def reader(self, schema):
        return EventsGenReader(self.options)


class EventsGenReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 10_000))
        self.parts = int(options.get("parts", 8))
        self.n_users = int(options.get("n_users", 1_000))

    def partitions(self):
        step = (self.n + self.parts - 1) // self.parts
        return [InputPartition((lo, min(lo + step, self.n)))
                for lo in range(0, self.n, step)]

    def read(self, partition):
        import datetime as dt

        lo, hi = partition.value
        for i in range(lo, hi):
            yield (
                i,
                dt.datetime.utcfromtimestamp(_BASE_EPOCH + i * 7),
                (i * 2654435761) % self.n_users,
                EVENT_TYPES[0] if i % 10 < 6 else
                EVENT_TYPES[1] if i % 10 < 9 else EVENT_TYPES[2],
                float((i * 48271) % 100_000) / 100.0,
            )


def register(spark) -> None:
    """Idempotent registration of the eventsgen format on a session."""
    spark.dataSource.register(EventsGenSource)


def source_pydatasource_agg(spark, sf_dir, n: int = 20_000,
                            parts: int = 8):
    """Registry entry: read the custom Python source partitioned and
    aggregate per event type — count + decimal-protocol value sum + a
    user-cardinality check. The DuckDB oracle regenerates the identical
    rows from generate_series (pure integer arithmetic both sides), so a
    hash match proves the source's partitioned generation end-to-end.
    ``sf_dir`` is unused: this entry exercises a non-file source."""
    from pyspark.sql import functions as F

    register(spark)
    df = (spark.read.format("eventsgen")
          .option("n", n).option("parts", parts).load())
    return (df.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.col("value").cast("decimal(28,6)"))
                 .cast("double").alias("total_value"),
                 F.countDistinct("user_id").alias("n_users"),
                 F.min("event_id").alias("min_id"),
                 F.max("event_id").alias("max_id"))
            .orderBy("event_type"))


ORACLE_PYDATASOURCE = """
WITH gen AS (
  SELECT i AS event_id,
         (i * 2654435761) % 1000 AS user_id,
         CASE WHEN i % 10 < 6 THEN 'click'
              WHEN i % 10 < 9 THEN 'view' ELSE 'purchase' END AS event_type,
         CAST((i * 48271) % 100000 AS DOUBLE) / 100.0 AS value
  FROM (SELECT UNNEST(generate_series(0, 19999)) AS i))
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users,
       MIN(event_id) AS min_id, MAX(event_id) AS max_id
FROM gen GROUP BY event_type ORDER BY event_type
"""
