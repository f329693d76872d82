"""CDC apply / upsert: MERGE semantics as a DataFrame composition.

The migration engine's ongoing-sync half: after the initial snapshot copy
(sources/migrate.py), a production cutover tails the source's change feed
and applies (upsert/delete) batches to the target. With an Iceberg/Delta
runtime this is ``MERGE INTO``; the engine expresses the same semantics
as a declarative plan that works on any snapshot DataFrame — and the
same shape IS what those runtimes execute under the hood.

Scale design: ONE full-outer join on the key (shuffle on key both sides —
the change batch is usually small, so AQE broadcasts it), then a
row-level action projection. No windows, no driver involvement; the
apply is a single stage pipeline after the join. Last-writer-wins within
a batch is resolved BEFORE the join by a max_by on a monotonically
increasing change sequence — one aggregation over the (small) batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import ld


def apply_changes(snapshot: DataFrame, changes: DataFrame,
                  key: str, op_col: str = "op",
                  seq_col: str | None = None) -> DataFrame:
    """Apply a CDC batch to a snapshot: ``op`` ∈ {'I','U','D'} (insert /
    update / delete; I and U are both upserts — the change row's payload
    wins). ``seq_col`` orders multiple changes to one key within the
    batch (last writer wins); omit it when keys are unique per batch.

    Returns the post-apply snapshot with the snapshot's column order.
    """
    payload_cols = [c for c in snapshot.columns]
    if seq_col is not None:
        latest = (changes.groupBy(key)
                  .agg(F.max_by(F.struct(op_col, *[c for c in payload_cols
                                                   if c != key]),
                                F.col(seq_col)).alias("__c"))
                  .select(key, F.col(f"__c.{op_col}").alias(op_col),
                          *[F.col(f"__c.{c}").alias(c)
                            for c in payload_cols if c != key]))
    else:
        latest = changes.select(key, op_col,
                                *[c for c in payload_cols if c != key])

    s = snapshot.alias("s")
    c = latest.alias("c")
    joined = s.join(c, F.col(f"s.{key}") == F.col(f"c.{key}"), "full_outer")
    keep = (F.col(f"c.{op_col}").isNull()        # unchanged snapshot row
            | (F.col(f"c.{op_col}") != "D"))     # not a delete
    merged = [
        F.when(F.col(f"c.{op_col}").isin("I", "U"), F.col(f"c.{col}"))
        .otherwise(F.col(f"s.{col}")).alias(col)
        for col in payload_cols
    ]
    return joined.filter(keep).select(*merged)


def cdc_apply_customers(spark, sf_dir) -> DataFrame:
    """Registry entry: apply a deterministic synthetic change batch to the
    customer snapshot — deletes (key % 10 == 0), balance updates
    (% 10 == 1, two competing changes so last-writer-wins is exercised),
    and inserts (new keys past the snapshot's range). Oracle replays the
    identical batch in SQL, so the hash match proves MERGE semantics:
    delete wins, payload overwrite, insert materialization, and
    untouched-row passthrough.

    Duplicate-PK contract (r12, nullfact gate): the synthetic batch is
    derived per KEY, not per snapshot row — a per-column MIN/MAX
    reduction (identity while the PK is unique, i.e. on every clean
    fixture) — so a corrupted snapshot carrying duplicate-key rows with
    different payloads still yields exactly one change per (key, seq).
    The old per-row derivation emitted two competing seq-2 updates for
    a duplicated key, and ``max_by``'s tie-break between them is
    engine-arbitrary. Duplicate TARGET rows are standard MERGE: every
    matching row is updated/deleted (the oracle fans the update out
    over the matching rows)."""
    snap = ld(spark, sf_dir, "customer")
    k = F.col("c_custkey")

    def per_key(df):
        return (df.groupBy("c_custkey")
                .agg(F.min("c_name").alias("c_name"),
                     F.min("c_nationkey").alias("c_nationkey"),
                     F.max("c_acctbal").alias("c_acctbal"),
                     F.min("c_mktsegment").alias("c_mktsegment")))

    deletes = (snap.filter(k % 10 == 0).select("c_custkey").distinct()
               .select(k.alias("c_custkey"), F.lit("D").alias("op"),
                       F.lit(1).alias("seq"),
                       F.lit(None).cast("string").alias("c_name"),
                       F.lit(None).cast("int").alias("c_nationkey"),
                       F.lit(None).cast("double").alias("c_acctbal"),
                       F.lit(None).cast("string").alias("c_mktsegment")))
    dim1 = per_key(snap.filter(k % 10 == 1))
    upd1 = (dim1.select("c_custkey", F.lit("U").alias("op"),
                        F.lit(1).alias("seq"), "c_name", "c_nationkey",
                        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
                        "c_mktsegment"))
    upd2 = (dim1.select("c_custkey", F.lit("U").alias("op"),
                        F.lit(2).alias("seq"), "c_name", "c_nationkey",
                        (F.col("c_acctbal") + 200.0).alias("c_acctbal"),
                        "c_mktsegment"))
    inserts = (per_key(snap.filter(k % 10 == 2))
               .select((k + 1_000_000).alias("c_custkey"),
                       F.lit("I").alias("op"), F.lit(1).alias("seq"),
                       F.concat(F.lit("new-"), "c_name").alias("c_name"),
                       "c_nationkey", F.lit(0.0).alias("c_acctbal"),
                       "c_mktsegment"))
    changes = deletes.union(upd1).union(upd2).union(inserts)
    out = apply_changes(snap, changes, key="c_custkey", seq_col="seq")
    return out.orderBy("c_custkey")


ORACLE_CDC_APPLY = """
WITH dim1 AS (
  SELECT c_custkey, MIN(c_name) AS c_name,
         MIN(c_nationkey) AS c_nationkey,
         MAX(c_acctbal) AS c_acctbal,
         MIN(c_mktsegment) AS c_mktsegment
  FROM customer WHERE c_custkey % 10 = 1 GROUP BY c_custkey),
upserts AS (
  SELECT c.c_custkey, d.c_name, d.c_nationkey,
         d.c_acctbal + 200.0 AS c_acctbal, d.c_mktsegment
  FROM customer c JOIN dim1 d USING (c_custkey)
  UNION ALL
  SELECT c_custkey + 1000000, 'new-' || MIN(c_name),
         MIN(c_nationkey), 0.0, MIN(c_mktsegment)
  FROM customer WHERE c_custkey % 10 = 2 GROUP BY c_custkey)
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM (
  SELECT * FROM customer
  WHERE c_custkey % 10 NOT IN (0, 1)
  UNION ALL
  SELECT * FROM upserts)
ORDER BY c_custkey
"""


def scd2_apply(history: DataFrame, changes: DataFrame, key: str,
               compare_cols: list[str], change_ts: str,
               from_col: str = "valid_from",
               to_col: str = "valid_to") -> DataFrame:
    """Slowly-Changing-Dimension Type 2 apply: history-preserving merge.

    ``history`` carries versioned rows (``valid_to IS NULL`` = current);
    ``changes`` carries one new payload per key. A key whose compared
    payload actually differs gets its current row CLOSED (valid_to =
    change_ts) and a new current row opened; identical payloads are
    no-ops (the standard SCD2 idempotence property). A change key with NO
    history row at all is a dimension INSERT: it opens a new current row
    (valid_from = change_ts) — the standard first-version case. Closed
    history rows pass through untouched.

    Plan: ONE full-outer join of current rows vs changes + two unioned
    projections — no windows, no driver loop; the changes side is
    broadcast-class, and Catalyst specializes the branch filters (the
    kept branch degrades the full-outer to an outer on the snapshot side).
    """
    cur = history.filter(F.col(to_col).isNull()).alias("s")
    hist = history.filter(F.col(to_col).isNotNull())
    c = changes.alias("c")
    diff = None
    for col in compare_cols:
        d = ~F.col(f"s.{col}").eqNullSafe(F.col(f"c.{col}"))
        diff = d if diff is None else (diff | d)
    j = cur.join(c, F.col(f"s.{key}") == F.col(f"c.{key}"), "full_outer")
    payload = [col for col in history.columns
               if col not in (from_col, to_col)]
    is_new = F.col(f"s.{key}").isNull()          # change key absent from dim
    changed = F.col(f"c.{key}").isNotNull() & ~is_new & diff
    # current rows: closed if changed, passed through otherwise
    kept = j.filter(~is_new).select(
        *[F.col(f"s.{col}").alias(col) for col in payload],
        F.col(f"s.{from_col}").alias(from_col),
        F.when(changed, F.lit(change_ts).cast("date"))
        .otherwise(F.col(f"s.{to_col}")).alias(to_col))
    # new current versions: changed keys re-open, unseen keys insert
    opened = (j.filter(changed | is_new)
              .select(*[F.col(f"c.{col}").alias(col) for col in payload],
                      F.lit(change_ts).cast("date").alias(from_col),
                      F.lit(None).cast("date").alias(to_col)))
    return hist.select(*payload, from_col, to_col).union(kept).union(opened)


def scd2_apply_customers(spark, sf_dir) -> DataFrame:
    """Registry entry: SCD2 over the customer dimension — keys with
    custkey % 10 == 3 move to segment 'MOVED' (a real change → close +
    open), keys % 10 == 4 receive an identical payload (no-op → single
    untouched current row), and keys % 10 == 5 arrive shifted past the
    snapshot's key range (a brand-new key → dimension insert opening its
    first version). The oracle replays the same merge in SQL; the hash
    match proves close/open/no-op/insert semantics and date handling.

    Duplicate-PK contract (r12, nullfact gate): the synthetic change
    batch is reduced to ONE row per key (per-column MIN/MAX — identity
    while the PK is unique, i.e. on every clean fixture); the old
    per-snapshot-row derivation handed scd2_apply two change rows for a
    duplicated key, and the current×changes join fanned every
    duplicated current row out once per change row."""
    base = (ld(spark, sf_dir, "customer")
            .withColumn("valid_from", F.lit("2024-01-01").cast("date"))
            .withColumn("valid_to", F.lit(None).cast("date")))
    k = F.col("c_custkey")

    def per_key(df):
        return (df.groupBy("c_custkey")
                .agg(F.min("c_name").alias("c_name"),
                     F.min("c_nationkey").alias("c_nationkey"),
                     F.max("c_acctbal").alias("c_acctbal"),
                     F.min("c_mktsegment").alias("c_mktsegment")))

    moved = (per_key(base.filter(k % 10 == 3))
             .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                     F.lit("MOVED").alias("c_mktsegment")))
    noop = (per_key(base.filter(k % 10 == 4))
            .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                    "c_mktsegment"))
    fresh = (per_key(base.filter(k % 10 == 5))
             .select((k + 1_000_000).alias("c_custkey"),
                     F.concat(F.lit("new-"), "c_name").alias("c_name"),
                     "c_nationkey", "c_acctbal",
                     F.lit("NEWKEY").alias("c_mktsegment")))
    out = scd2_apply(base, moved.union(noop).union(fresh), key="c_custkey",
                     compare_cols=["c_mktsegment"],
                     change_ts="2024-06-01")
    return (out.select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                       "c_mktsegment",
                       F.date_format("valid_from", "yyyy-MM-dd")
                       .alias("valid_from"),
                       F.date_format("valid_to", "yyyy-MM-dd")
                       .alias("valid_to"))
            .orderBy("c_custkey", "valid_from"))


ORACLE_SCD2_APPLY = """
WITH closed AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         '2024-01-01' AS valid_from,
         CASE WHEN c_custkey % 10 = 3 THEN '2024-06-01' END AS valid_to
  FROM customer),
opened AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
         'MOVED' AS c_mktsegment,
         '2024-06-01' AS valid_from, NULL AS valid_to
  FROM customer WHERE c_custkey % 10 = 3),
inserted AS (
  SELECT c_custkey + 1000000 AS c_custkey, 'new-' || c_name AS c_name,
         c_nationkey, c_acctbal, 'NEWKEY' AS c_mktsegment,
         '2024-06-01' AS valid_from, NULL AS valid_to
  FROM customer WHERE c_custkey % 10 = 5)
SELECT * FROM closed UNION ALL SELECT * FROM opened
UNION ALL SELECT * FROM inserted
ORDER BY c_custkey, valid_from
"""


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column-profile audit in ONE scan: per column, null count, distinct
    count, and min/max rendered as strings (strings make one output
    schema fit every column type). This is the data-quality pass a
    migration runs on source and target to certify a copy — and the
    numbers the assessment report consumes.

    Shape: a single aggregation computes all columns' statistics
    simultaneously (no per-column scans); the long-form reshape is a
    zero-shuffle unpivot of one row."""
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"n_{c}"),
            F.countDistinct(c).alias(f"d_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    row = df.agg(*aggs)
    pairs = F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.col(f"n_{c}").alias("n_nulls"),
                 F.col(f"d_{c}").alias("n_distinct"),
                 F.col(f"mn_{c}").alias("min_str"),
                 F.col(f"mx_{c}").alias("max_str"))
        for c in cols
    ])
    return (row.select(F.explode(pairs).alias("p")).select("p.*")
            .orderBy("col_name"))


def profile_customer_stats(spark, sf_dir) -> DataFrame:
    """Registry entry: profile every customer column in one scan."""
    c = ld(spark, sf_dir, "customer")
    return profile_table(c, ["c_custkey", "c_name", "c_nationkey",
                             "c_acctbal", "c_mktsegment"])


ORACLE_PROFILE_CUSTOMER = """
SELECT col_name, CAST(n_nulls AS BIGINT) AS n_nulls, n_distinct,
       min_str, max_str FROM (
  SELECT 'c_custkey' AS col_name,
         SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS n_nulls,
         COUNT(DISTINCT c_custkey) AS n_distinct,
         CAST(MIN(c_custkey) AS VARCHAR) AS min_str,
         CAST(MAX(c_custkey) AS VARCHAR) AS max_str
  FROM customer
  UNION ALL
  SELECT 'c_name', SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT c_name), MIN(c_name), MAX(c_name) FROM customer
  UNION ALL
  SELECT 'c_nationkey', SUM(CASE WHEN c_nationkey IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT c_nationkey), CAST(MIN(c_nationkey) AS VARCHAR),
         CAST(MAX(c_nationkey) AS VARCHAR) FROM customer
  UNION ALL
  SELECT 'c_acctbal', SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT c_acctbal), CAST(MIN(c_acctbal) AS VARCHAR),
         CAST(MAX(c_acctbal) AS VARCHAR) FROM customer
  UNION ALL
  SELECT 'c_mktsegment', SUM(CASE WHEN c_mktsegment IS NULL THEN 1 ELSE 0 END),
         COUNT(DISTINCT c_mktsegment), MIN(c_mktsegment), MAX(c_mktsegment)
  FROM customer)
ORDER BY col_name
"""


def scd2_point_in_time_join(spark, sf_dir,
                            change_date: str = "1998-01-01") -> DataFrame:
    """Point-in-time (temporal) fact lookup against SCD2 history: each
    order joins to the customer VERSION that was valid on its order date —
    the query pattern versioned dimensions exist for.

    History here is the two-version build from ``scd2_apply`` (segment
    change on {change_date} for keys % 10 == 3); the join is an equi-join
    on the key plus the validity-range predicate evaluated at the probe —
    at scale this is key-partitioned with a ≤versions-per-key fanout,
    never a cartesian (same shape Iceberg/Delta time travel compiles to).
    """
    base = (ld(spark, sf_dir, "customer")
            .withColumn("valid_from", F.lit("1995-01-01").cast("date"))
            .withColumn("valid_to", F.lit(None).cast("date")))
    moved = (base.filter(F.col("c_custkey") % 10 == 3)
             .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                     F.lit("MOVED").alias("c_mktsegment")))
    hist = scd2_apply(base, moved, key="c_custkey",
                      compare_cols=["c_mktsegment"], change_ts=change_date)
    o = ld(spark, sf_dir, "orders", fanout=False).select(
        "o_orderkey", "o_custkey", F.to_date("o_orderdate").alias("od"))
    j = o.join(hist.alias("h"),
               (F.col("o_custkey") == F.col("h.c_custkey"))
               & (F.col("od") >= F.col("h.valid_from"))
               & ((F.col("h.valid_to").isNull())
                  | (F.col("od") < F.col("h.valid_to"))))
    return (j.select("o_orderkey", "o_custkey",
                     F.col("h.c_mktsegment").alias("segment_at_order"))
            .orderBy("o_orderkey"))


ORACLE_SCD2_PIT = """
WITH hist AS (
  SELECT c_custkey, c_mktsegment, DATE '1995-01-01' AS valid_from,
         CASE WHEN c_custkey % 10 = 3 THEN DATE '1998-01-01' END AS valid_to
  FROM customer
  UNION ALL
  SELECT c_custkey, 'MOVED', DATE '1998-01-01', NULL
  FROM customer WHERE c_custkey % 10 = 3)
SELECT o_orderkey, o_custkey, h.c_mktsegment AS segment_at_order
FROM orders o JOIN hist h
  ON o.o_custkey = h.c_custkey
 AND CAST(o.o_orderdate AS DATE) >= h.valid_from
 AND (h.valid_to IS NULL OR CAST(o.o_orderdate AS DATE) < h.valid_to)
ORDER BY o_orderkey
"""


def scd2_history_from_events(spark, sf_dir) -> DataFrame:
    """Build an SCD Type 2 validity-interval history FROM a change log:
    each user's event stream is compressed to its state CHANGES (drop
    consecutive repeats of the same event_type), and each surviving
    change opens an interval [its ts, next change's ts) — the standard
    "reconstruct the dimension history from CDC events" shape, inverse
    of ``scd2_apply`` (which merges changes INTO an existing history).

    Plan: two windows over the SAME (user_id | ts, event_id) ordering —
    the lag that detects changes and the lead that closes intervals run
    in one sort within one keyed shuffle; no second exchange (the change
    filter preserves partitioning and order). is_current falls out of
    the NULL lead. Users shard the state at any scale.
    """
    from .relational import _fmt_ts, load_events
    from pyspark.sql import Window

    e = load_events(spark, sf_dir).select(
        "user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), "event_id")
    changes = (e.withColumn("prev_type", F.lag("event_type").over(w))
               .filter(F.col("prev_type").isNull()
                       | (F.col("prev_type") != F.col("event_type"))))
    w2 = Window.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), "event_id")
    hist = changes.withColumn("valid_to_ts", F.lead("ts").over(w2))
    return (hist.select(
        "user_id", F.col("event_type").alias("state"),
        _fmt_ts("ts").alias("valid_from"),
        F.coalesce(_fmt_ts("valid_to_ts"), F.lit("9999-12-31 00:00:00"))
        .alias("valid_to"),
        F.col("valid_to_ts").isNull().alias("is_current"))
        .orderBy("user_id", "valid_from"))


ORACLE_SCD2_FROM_EVENTS = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), changes AS (
  SELECT user_id, ts, event_id, event_type FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
), hist AS (
  SELECT user_id, event_type, ts,
         LEAD(ts) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id) AS valid_to_ts
  FROM changes
)
SELECT user_id, event_type AS state,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
       COALESCE(strftime(valid_to_ts, '%Y-%m-%d %H:%M:%S'),
                '9999-12-31 00:00:00') AS valid_to,
       valid_to_ts IS NULL AS is_current
FROM hist
ORDER BY user_id, valid_from
"""


def merge_into(target: DataFrame, source: DataFrame, key: str,
               when_matched_delete: F.Column | None = None,
               when_matched_update: dict[str, F.Column] | None = None,
               when_not_matched_insert: dict[str, F.Column] | None = None
               ) -> DataFrame:
    """ANSI / Iceberg ``MERGE INTO`` as a DataFrame composition — the
    clause-driven twin of ``apply_changes`` (which is op-tagged CDC).
    Clause semantics and precedence follow the SQL standard:

    - WHEN MATCHED AND ``when_matched_delete`` THEN DELETE (evaluated
      first, like a leading conditional DELETE clause);
    - WHEN MATCHED THEN UPDATE SET ``when_matched_update`` (a partial
      SET — unnamed target columns pass through);
    - WHEN NOT MATCHED THEN INSERT ``when_not_matched_insert`` (omit to
      drop unmatched source rows, i.e. no INSERT clause).

    Expressions reference the two sides through the aliases ``t.`` and
    ``s.`` (e.g. ``F.col("s.c_acctbal") < 0``), exactly how the SQL
    clauses reference target/source. This is what an Iceberg/Delta
    runtime executes under MERGE INTO; expressed declaratively it runs
    on any snapshot DataFrame, and the physical shape is the same ONE
    full-outer key join + row-action projection as ``apply_changes`` —
    the change batch side broadcasts under AQE when small.

    Reference intent: the conversion engine emits Iceberg DDL
    (converter.py:103-183); MERGE INTO is the DML its migrated tables
    are used with day to day.
    """
    cols = list(target.columns)
    # presence markers, not key-NULL tests: a NULL-key target row must
    # survive as-is and a NULL-key source row must INSERT — but NULL
    # keys never satisfy the equality, so key-isNotNull as a "this side
    # joined" proxy mangled a NULL-key target row into all-NULLs and
    # its non-matching source twin into a duplicate (r9 self-review
    # find; exact ANSI MERGE semantics: NULL keys simply never match).
    t = target.withColumn("__t", F.lit(True)).alias("t")
    s = source.withColumn("__s", F.lit(True)).alias("s")
    j = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    matched = F.col("t.__t").isNotNull() & F.col("s.__s").isNotNull()
    delete = (matched & when_matched_delete) if when_matched_delete \
        is not None else F.lit(False)
    upd = when_matched_update or {}
    out_cols = []
    for c in cols:
        updated = upd.get(c, F.col(f"t.{c}"))
        if when_not_matched_insert is not None:
            inserted = when_not_matched_insert.get(
                c, F.lit(None).cast(target.schema[c].dataType))
        else:
            inserted = F.col(f"t.{c}")   # unreachable: row filtered below
        out_cols.append(
            F.when(matched, updated)
            .when(F.col("t.__t").isNotNull(), F.col(f"t.{c}"))
            .otherwise(inserted).alias(c))
    keep = ~delete
    if when_not_matched_insert is None:
        keep = keep & F.col("t.__t").isNotNull()
    return j.filter(keep).select(*out_cols)


def merge_into_customers(spark, sf_dir) -> DataFrame:
    """Registry entry: clause-driven MERGE over the customer dimension —
    a staging batch carries balance corrections (key % 10 == 6, applied
    via a partial UPDATE SET), tombstones (key % 10 == 7 arrive with a
    negative balance → conditional DELETE clause), and fresh keys past
    the snapshot range (INSERT clause with a derived segment). The
    oracle replays the same clauses as joins/unions in SQL; the hash
    match proves clause precedence (delete before update), partial-SET
    passthrough, and insert materialization."""
    snap = ld(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    corrections = (snap.filter(k % 10 == 6)
                   .select("c_custkey",
                           (F.col("c_acctbal") + 50.0).alias("c_acctbal"),
                           F.lit("CORRECTED").alias("c_mktsegment")))
    tombstones = (snap.filter(k % 10 == 7)
                  .select("c_custkey", F.lit(-1.0).alias("c_acctbal"),
                          F.lit("DEAD").alias("c_mktsegment")))
    fresh = (snap.filter(k % 10 == 8)
             .select((k + 2_000_000).alias("c_custkey"),
                     F.lit(10.0).alias("c_acctbal"),
                     F.lit("ONBOARD").alias("c_mktsegment")))
    staging = corrections.union(tombstones).union(fresh)
    out = merge_into(
        snap, staging, key="c_custkey",
        when_matched_delete=F.col("s.c_acctbal") < 0,
        when_matched_update={
            "c_acctbal": F.col("s.c_acctbal"),
            "c_mktsegment": F.col("s.c_mktsegment"),
        },
        when_not_matched_insert={
            "c_custkey": F.col("s.c_custkey"),
            "c_name": F.lit("onboarded"),
            "c_nationkey": F.lit(0),
            "c_acctbal": F.col("s.c_acctbal"),
            "c_mktsegment": F.col("s.c_mktsegment"),
        })
    return out.orderBy("c_custkey")


ORACLE_MERGE_INTO = """
WITH staging AS (
  SELECT c_custkey, c_acctbal + 50.0 AS c_acctbal,
         'CORRECTED' AS c_mktsegment
  FROM customer WHERE c_custkey % 10 = 6
  UNION ALL
  SELECT c_custkey, -1.0, 'DEAD' FROM customer WHERE c_custkey % 10 = 7
  UNION ALL
  SELECT c_custkey + 2000000, 10.0, 'ONBOARD'
  FROM customer WHERE c_custkey % 10 = 8
), matched AS (
  SELECT t.c_custkey, t.c_name, t.c_nationkey,
         s.c_acctbal AS c_acctbal, s.c_mktsegment AS c_mktsegment,
         s.c_acctbal < 0 AS is_delete
  FROM customer t JOIN staging s ON t.c_custkey = s.c_custkey
), untouched AS (
  SELECT t.c_custkey, t.c_name, t.c_nationkey, t.c_acctbal, t.c_mktsegment
  FROM customer t ANTI JOIN staging s ON t.c_custkey = s.c_custkey
), inserted AS (
  SELECT s.c_custkey, 'onboarded' AS c_name, 0 AS c_nationkey,
         s.c_acctbal, s.c_mktsegment
  FROM staging s ANTI JOIN customer t ON s.c_custkey = t.c_custkey
)
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM matched WHERE NOT is_delete
  UNION ALL SELECT * FROM untouched
  UNION ALL SELECT * FROM inserted
)
ORDER BY c_custkey
"""


def ivm_join_view_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view — the two-sided delta-join
    algebra an aggregate-only refresh (rollup_incremental_refresh)
    cannot express. View: revenue by (order priority, market segment)
    over orders ⋈ customer. Both base tables receive an insert delta
    (orders split on o_orderkey % 13, customers on c_custkey % 7), and
    the refresh computes ONLY the delta terms

        Δ(A ⋈ B) = ΔA ⋈ B_old  ∪  A_old ⋈ ΔB  ∪  ΔA ⋈ ΔB

    merged into the old view by re-aggregation (sums combine). The
    oracle recomputes the view from the FULL tables, so the driver's
    hash comparison IS the proof of the maintenance algebra — if any
    delta term were missing or double-counted, the hash breaks.

    Scale: refresh cost is O(Δ ⋈ base) — at 100 TB the old view is the
    stored MV (here re-derived from the same scan for self-containment)
    and ΔA/ΔB are broadcast-sized in steady state; the three delta
    joins are exactly what Spark's AQE sizes small. Revenue stays
    DECIMAL through every partial (exact, order-independent), one
    double cast at emission.
    """
    from .relational import DEC, ld

    o = ld(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice")
    c = ld(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o_old = o.filter(F.col("o_orderkey") % 13 != 0)
    o_new = o.filter(F.col("o_orderkey") % 13 == 0)
    c_old = c.filter(F.col("c_custkey") % 7 != 0)
    c_new = c.filter(F.col("c_custkey") % 7 == 0)

    def agg(orders, custs):
        return (orders.join(custs,
                            orders["o_custkey"] == custs["c_custkey"])
                .groupBy("o_orderpriority", "c_mktsegment")
                .agg(F.sum(F.col("o_totalprice").cast(DEC))
                     .alias("revenue"),
                     F.count(F.lit(1)).alias("n_orders")))

    view_old = agg(o_old, c_old)
    deltas = (agg(o_new, c_old)
              .unionAll(agg(o_old, c_new))
              .unionAll(agg(o_new, c_new)))
    return (view_old.unionAll(deltas)
            .groupBy("o_orderpriority", "c_mktsegment")
            .agg(F.sum("revenue").cast("double").alias("revenue"),
                 F.sum("n_orders").alias("n_orders"))
            .orderBy("o_orderpriority", "c_mktsegment"))


ORACLE_IVM_JOIN_VIEW = """
SELECT o_orderpriority, c_mktsegment,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY o_orderpriority, c_mktsegment
ORDER BY o_orderpriority, c_mktsegment
"""
