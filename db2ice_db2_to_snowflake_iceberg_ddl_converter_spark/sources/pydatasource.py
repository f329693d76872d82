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

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

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


# ---------------------------------------------------------------------------
# kvlines: a full read+WRITE Python DataSource with commit/abort semantics
# ---------------------------------------------------------------------------

_SEP = "\x01"
_NULL = "\\N"


def _enc(v) -> str:
    """One cell → text, loss-free for the demo types: None → the \\N
    sentinel, float → repr() (shortest round-tripping form — parses back
    to the identical IEEE double), everything else str(). Strings carrying
    the separator / newline / bare sentinel are rejected rather than
    silently corrupted — a data sink must fail loudly on unencodable
    input, not produce unreadable files."""
    if v is None:
        return _NULL
    if isinstance(v, float):
        return repr(v)
    s = str(v)
    if _SEP in s or "\n" in s or s == _NULL:
        raise ValueError(f"kvlines cannot encode cell {s!r}")
    return s


def _dec(cell: str, typ: str):
    if cell == _NULL:
        return None
    if typ in ("bigint", "long", "int", "integer"):
        return int(cell)
    if typ == "double":
        return float(cell)
    return cell


class _KvCommit(WriterCommitMessage):
    def __init__(self, filename: str, n_rows: int):
        self.filename = filename
        self.n_rows = n_rows


class KvLinesSource(DataSource):
    """``kvlines``: a manifest-committed line-format table — the WRITE half
    of the Python DataSource surface (eventsgen above covers read-only).

    Write path semantics (the part a real connector must get right):

    - each partition task writes to a ``_tmp-`` file and atomically
      renames to its final name only when fully written (no torn files);
    - ``commit()`` runs once on the driver AFTER every task succeeded and
      publishes ``_MANIFEST.json`` naming exactly the committed files —
      readers see all-or-nothing, never a partial job;
    - ``abort()`` removes stragglers, so a failed job leaves no visible
      output. This is the same task-commit/job-commit protocol Hadoop
      committers implement, expressed in ~40 lines of Python.

    The reader lists the MANIFEST (never the directory — uncommitted or
    aborted files are invisible by construction) and yields one input
    partition per committed file, decoding by the schema passed by the
    engine (``.schema(...)`` on read, or this source's demo default).

    Contract limit (documented, not hidden): each job's ``commit()``
    REPLACES the manifest, so a second write to the same path publishes
    only its own files — kvlines tables are write-once-per-path
    (re-runs are idempotent replacements, which is exactly what the
    retry-safe demo needs). A true append would version part filenames
    per job and union manifests; out of scope here.
    """

    @classmethod
    def name(cls) -> str:
        return "kvlines"

    def schema(self) -> str:
        return self.options.get(
            "schema", "nation_key long, n_customers long, "
                      "total_acctbal double")

    def reader(self, schema):
        return KvLinesReader(self.options, schema)

    def writer(self, schema, overwrite: bool):
        return KvLinesWriter(self.options, overwrite)


class KvLinesReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options["path"]
        self.types = [f.dataType.simpleString() for f in schema.fields]

    def partitions(self):
        import json
        import os

        with open(os.path.join(self.path, "_MANIFEST.json")) as fh:
            manifest = json.load(fh)
        return [InputPartition(name) for name in manifest["files"]]

    def read(self, partition):
        import os

        with open(os.path.join(self.path, partition.value)) as fh:
            for line in fh:
                cells = line.rstrip("\n").split(_SEP)
                yield tuple(_dec(c, t) for c, t in zip(cells, self.types))


class KvLinesWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        final = f"part-{pid:05d}.kvl"
        tmp = os.path.join(self.path, f"_tmp-{final}-{uuid.uuid4().hex}")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                fh.write(_SEP.join(_enc(v) for v in row) + "\n")
                n += 1
        os.replace(tmp, os.path.join(self.path, final))  # atomic publish
        return _KvCommit(final, n)

    def commit(self, messages):
        import json
        import os

        manifest = {
            "files": sorted(m.filename for m in messages),
            "n_rows": sum(m.n_rows for m in messages),
        }
        tmp = os.path.join(self.path, "_MANIFEST.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, os.path.join(self.path, "_MANIFEST.json"))

    def abort(self, messages):
        import glob
        import os

        for straggler in glob.glob(os.path.join(self.path, "_tmp-*")):
            try:
                os.remove(straggler)
            except OSError:
                pass


def sink_pydatasource_roundtrip(spark, sf_dir):
    """Registry entry: per-nation customer rollup → WRITE through the
    kvlines Python DataSource (task-commit protocol above) → READ back
    through its reader → re-sort. The DuckDB oracle computes the same
    rollup straight from parquet, so a hash match proves the custom
    write path is loss-free end-to-end, floats included (repr round-trip
    is bit-exact). ``repartition(4)`` forces a multi-file commit so the
    manifest actually coordinates more than one task."""
    import os

    from pyspark.sql import functions as F

    from .registry import _scratch_dir

    spark.dataSource.register(KvLinesSource)
    c = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    agg = (c.groupBy(F.col("c_nationkey").alias("nation_key"))
           .agg(F.count(F.lit(1)).alias("n_customers"),
                F.sum(F.col("c_acctbal").cast("decimal(28,6)"))
                .cast("double").alias("total_acctbal")))
    out = _scratch_dir("kvlines_")
    (agg.repartition(4, "nation_key").write.format("kvlines")
     .option("path", out).mode("append").save())
    return (spark.read.format("kvlines").option("path", out).load()
            .orderBy("nation_key"))


ORACLE_SINK_PYDATASOURCE = """
SELECT c_nationkey AS nation_key, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
         AS total_acctbal
FROM customer GROUP BY 1 ORDER BY nation_key
"""


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
