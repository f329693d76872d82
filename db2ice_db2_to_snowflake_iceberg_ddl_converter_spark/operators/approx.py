"""Approximate aggregation operators — the sketches that replace exact
shuffles at 100 TB.

Exact count-distinct shuffles every distinct value; HyperLogLog++ ships a
few-KB sketch per partition. Exact quantiles require a global sort;
Greenwald-Khanna/KLL-style summaries merge map-side. Both are rows-only
for the driver (approximate results differ across engines by design);
tests/test_operators.py pins their error bounds against exact answers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import ld


def approx_distinct_counts(spark, sf_dir, rsd: float = 0.02):
    """HLL++ distinct counts per order-priority with a 2% target rsd,
    alongside the exact count for in-plan comparability."""
    o = ld(spark, sf_dir, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.approx_count_distinct("o_custkey", rsd)
                 .alias("approx_customers"),
                 F.count_distinct("o_custkey").alias("exact_customers"),
                 F.count(F.lit(1)).alias("n_orders"))
            .orderBy("o_orderpriority"))


QUANTILE_PROBS = (0.25, 0.5, 0.75, 0.95, 0.99)


def approx_quantiles(spark, sf_dir, accuracy: int = 10_000):
    """percentile_approx (GK summary) for the order-value distribution —
    the shuffle-free quantile path; accuracy=10k keeps rank error ≤1e-4·n.

    Emitted one row per quantile (posexplode of the sketch's array): the
    driver's pandas canonicalizer can't hash array cells (round-1 err row),
    and scalar rows are the friendlier shape for downstream joins anyway.
    """
    o = ld(spark, sf_dir, "orders")
    agg = o.agg(
        F.percentile_approx("o_totalprice", list(QUANTILE_PROBS),
                            accuracy).alias("price_quantiles"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"))
    probs = F.array(*[F.lit(q) for q in QUANTILE_PROBS])
    return (agg.select("min_price", "max_price",
                       F.posexplode("price_quantiles").alias("pos", "value"))
            .select(F.element_at(probs, F.col("pos") + 1).alias("quantile"),
                    F.col("value").alias("approx_value"),
                    "min_price", "max_price"))


def approx_quantiles_checked(spark, sf_dir,
                             accuracy: int = 10_000) -> DataFrame:
    """Partial-oracle form of :func:`approx_quantiles` (round 9): the
    quantile probes and the exact min/max ride the DuckDB hash gate, and
    each GK estimate collapses to ``rank_in_band`` — the sketch's own
    guarantee, checked against the EXACT rank of the returned value:
    with ε = 1/accuracy, percentile_approx(q) must return a value whose
    rank window [count(< v), count(≤ v)] intersects
    [⌈q·n⌉ − εn − 1, ⌈q·n⌉ + εn + 1] (±1 absorbs the discrete-rank
    convention). The rank probe is ONE orders scan joined to the 5
    broadcast quantile rows. The raw sketch core stays as
    :func:`approx_quantiles` for the bound pytest."""
    # pin: the 5-row GK result feeds the rank probe AND the final
    # join — without it the percentile_approx agg runs twice
    from .scale import pin
    base = pin(approx_quantiles(spark, sf_dir, accuracy=accuracy))
    # n counts the sketch's ACTUAL input — percentile_approx ignores
    # NULL amounts, so the band's target rank must too (r12, nullfact
    # gate: the unfiltered count inflated n and pushed the target rank
    # outside the ε-band on corrupted shards)
    o = (ld(spark, sf_dir, "orders").select("o_totalprice")
         .filter(F.col("o_totalprice").isNotNull()))
    n = o.agg(F.count(F.lit(1)).alias("n"))
    ranks = (o.crossJoin(F.broadcast(base.select("quantile",
                                                 "approx_value")))
             .groupBy("quantile", "approx_value")
             .agg(F.sum((F.col("o_totalprice")
                         < F.col("approx_value")).cast("long"))
                  .alias("rank_lo"),
                  F.sum((F.col("o_totalprice")
                         <= F.col("approx_value")).cast("long"))
                  .alias("rank_hi")))
    eps = 1.0 / accuracy
    target = F.ceil(F.col("quantile") * F.col("n").cast("double"))
    slack = F.col("n").cast("double") * F.lit(eps) + F.lit(1.0)
    in_band = ((F.col("rank_hi").cast("double")
                >= target.cast("double") - slack)
               & (F.col("rank_lo").cast("double")
                  <= target.cast("double") + slack))
    return (base.join(ranks, ["quantile", "approx_value"])
            .crossJoin(F.broadcast(n))
            .select("quantile", "min_price", "max_price",
                    in_band.alias("rank_in_band"))
            .orderBy("quantile"))


ORACLE_APPROX_QUANTILES_CHECKED = """
SELECT CAST(q.quantile AS DOUBLE) AS quantile,
       (SELECT MIN(o_totalprice) FROM orders) AS min_price,
       (SELECT MAX(o_totalprice) FROM orders) AS max_price,
       TRUE AS rank_in_band
FROM (VALUES (0.25),(0.5),(0.75),(0.95),(0.99)) AS q(quantile)
ORDER BY q.quantile
"""


def exact_quantiles(spark, sf_dir):
    """Exact reference for the bound test (global sort at scale — this is
    the expensive path the sketch replaces)."""
    o = ld(spark, sf_dir, "orders")
    return o.agg(F.percentile("o_totalprice",
                              F.array(*[F.lit(q) for q in
                                        (0.25, 0.5, 0.75, 0.95, 0.99)]))
                 .alias("price_quantiles"))


def approx_hll_union(spark, sf_dir):
    """The mergeability story that matters at 100 TB: HLL sketches built
    independently per table (= per partition / per day in production) and
    UNIONED as sketches, no re-scan of either input. ``hll_sketch_agg``
    partial states merge map-side; ``hll_union_agg`` merges the finished
    sketches; the estimate is taken once at the end. Rows-only for the
    driver (sketch estimates are engine-specific); the error bound vs the
    exact distinct union is pinned in tests.
    """
    c = (ld(spark, sf_dir, "customer")
         .agg(F.hll_sketch_agg("c_custkey").alias("sk"),
              F.count_distinct("c_custkey").alias("exact")))
    o = (ld(spark, sf_dir, "orders")
         .agg(F.hll_sketch_agg("o_custkey").alias("sk"),
              F.count_distinct("o_custkey").alias("exact")))
    return (c.unionByName(o)
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sk"))
                 .alias("approx_union_customers"),
                 F.sum("exact").alias("sum_of_parts")))


def frequent_tokens_misra_gries(spark: SparkSession, sf_dir: str,
                                k: int = 64) -> DataFrame:
    """Heavy hitters via a distributed Misra-Gries sketch: every input
    partition summarizes its token stream into at most ``k`` counters
    (one Arrow pass, O(k) memory regardless of partition size), the
    per-partition summaries merge by counter addition, and the merged
    sketch keeps the MG guarantee: any token with true frequency
    > N/(k+1) MUST survive, and each kept estimate undercounts by at
    most N/(k+1).

    This is the third mergeable-sketch class in the engine (HLL++ for
    distinct, GK for quantiles, MG for heavy hitters) — the pattern that
    makes one-pass corpus profiling possible at 100 TB: executor state
    is O(k), the shuffle carries partitions × k rows, and the final
    merge is one reduce. Counter decrement is the only non-trivial step
    and runs vectorized per Arrow batch.

    Approximate by construction → rows-only driver check;
    tests/test_eventtime.py pins the support guarantee against the
    exact counts.
    """
    import pandas as pd

    d = ld(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))

    def mg_partition(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for tok, cnt in pdf["tok"].value_counts().items():
                cnt = int(cnt)
                if tok in counters:
                    counters[tok] += cnt
                elif len(counters) < k:
                    counters[tok] = cnt
                else:
                    # decrement all by the min headroom; vectorized over
                    # the batch via value_counts so this path is rare
                    dec = min(cnt, min(counters.values()))
                    counters = {t: c - dec for t, c in counters.items()
                                if c - dec > 0}
                    if cnt - dec > 0:
                        counters[tok] = cnt - dec
        yield pd.DataFrame({"tok": list(counters),
                            "est": list(counters.values())})

    summaries = toks.mapInPandas(mg_partition, "tok string, est long")
    # merge: counter addition keeps the union guarantee (merged error
    # bounds add); the merged table is <= partitions x k rows — tiny.
    # NO top-k cut here: a guaranteed-frequent token whose estimate was
    # decremented to near zero could be evicted by up to partitions x k
    # near-threshold tokens with larger retained estimates, so limit(k)
    # would void the documented support guarantee on adversarial
    # distributions. Callers wanting exactly k rows re-rank the (tiny)
    # result against exact counts of just these candidates.
    return (summaries.groupBy("tok")
            .agg(F.sum("est").alias("est_count"))
            .orderBy(F.desc("est_count"), "tok"))


def frequent_tokens_mg_checked(spark: SparkSession, sf_dir: str,
                               k: int = 64) -> DataFrame:
    """Partial-oracle form of :func:`frequent_tokens_misra_gries`
    (round 9): the corpus's exact token total and the count of
    GUARANTEED heavy hitters (true frequency > N/(k+1), integer-compared
    as c·(k+1) > N) ride the DuckDB hash gate, and the sketch collapses
    to its three textbook invariants as oracle-asserted booleans:

    - ``all_guaranteed_present``: every guaranteed token survives the
      merged sketch (the MG support guarantee);
    - ``est_le_exact``: merged estimates never overcount (per-partition
      MG underestimates; counter addition preserves it);
    - ``undercount_in_bound``: exact − est ≤ N/(k+1) for every emitted
      token (merged decrements add to at most Σ N_p/(k+1) = N/(k+1)).

    The probe joins the (≤ partitions × k)-row sketch to the exact
    vocab-sized counts — one extra hash-agg over the token stream, the
    same shape the support pytest runs."""
    # pin: the (<= partitions x k)-row sketch feeds two consumers
    # below (the multi-consumer rule); tiny frame, cheap pin
    from .scale import pin
    sketch = pin(frequent_tokens_misra_gries(spark, sf_dir, k=k))
    d = ld(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.agg(F.count(F.lit(1)).alias("n_tokens"))
    guaranteed = (exact.crossJoin(F.broadcast(tot))
                  .filter(F.col("c") * (k + 1) > F.col("n_tokens"))
                  .select("tok", "c"))
    n_guar = guaranteed.agg(F.count(F.lit(1)).alias("n_guaranteed"))
    missing = (guaranteed.join(sketch.select("tok"), "tok", "left_anti")
               .agg(F.count(F.lit(1)).alias("n_missing")))
    joined = (sketch.join(exact, "tok")
              .crossJoin(F.broadcast(tot))
              .agg(F.max((F.col("est_count") > F.col("c")).cast("int"))
                   .alias("any_over"),
                   F.max(((F.col("c") - F.col("est_count")) * (k + 1)
                          > F.col("n_tokens")).cast("int"))
                   .alias("any_oob")))
    return (tot.crossJoin(F.broadcast(n_guar))
            .crossJoin(F.broadcast(missing))
            .crossJoin(F.broadcast(joined))
            .select("n_tokens", "n_guaranteed",
                    (F.col("n_missing") == 0).alias("all_guaranteed_present"),
                    (F.coalesce("any_over", F.lit(0)) == 0)
                    .alias("est_le_exact"),
                    (F.coalesce("any_oob", F.lit(0)) == 0)
                    .alias("undercount_in_bound")))


ORACLE_FREQUENT_TOKENS_MG_CHECKED = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), tot AS (SELECT COUNT(*) AS n_tokens FROM toks),
ex AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok)
SELECT t.n_tokens,
       CAST((SELECT COUNT(*) FROM ex, tot
             WHERE c * 65 > n_tokens) AS BIGINT) AS n_guaranteed,
       TRUE AS all_guaranteed_present,
       TRUE AS est_le_exact,
       TRUE AS undercount_in_bound
FROM tot t
"""


def token_counts_countmin(spark: SparkSession, sf_dir: str,
                          depth: int = 4, width: int = 512,
                          n_probe: int = 40) -> DataFrame:
    """Count-Min sketch over the corpus token stream — the fourth
    mergeable-sketch class (HLL++ distinct, GK quantiles, MG heavy
    hitters, CM point frequencies): a depth × width counter matrix where
    every token increments one counter per row (hash_d(tok) mod width),
    and a point estimate is the MIN across rows — always ≥ the true
    count, over by at most ≈ 2N/width with prob. 1 − 2^−depth.

    Scale shape: the matrix is built ENTIRELY relationally — explode the
    depth hash probes per token (pure Catalyst: ``xxhash64(tok, seed)``)
    and hash-aggregate on (row, bucket); partial aggregation makes each
    executor emit ≤ depth × width partial cells, so the shuffle is
    sketch-sized, not corpus-sized — the same property the dedicated
    sketch libraries buy with custom merge code, here for free from
    Spark's agg machinery. The probe stage then estimates the ``n_probe``
    alphabetically-first distinct tokens by broadcasting their probe
    cells back onto the cell table.

    Estimates are approximate by construction → rows-only driver check;
    the pytest pins the CM invariants (est ≥ true, overcount bound)
    against exact counts.
    """
    d = ld(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    probes = F.array(*[
        F.struct(F.lit(r).alias("row"),
                 F.pmod(F.xxhash64("tok", F.lit(r)), F.lit(width))
                 .cast("int").alias("bucket"))
        for r in range(depth)
    ])
    cells = (toks.select(F.explode(probes).alias("p"))
             .groupBy("p.row", "p.bucket")
             .agg(F.count(F.lit(1)).alias("cnt")))

    # probe set: bounded, deterministic (alphabetically-first distinct
    # tokens); its probe cells are derived with the SAME hash expression
    queries = (toks.select("tok").distinct()
               .orderBy("tok").limit(n_probe)
               .select("tok", F.explode(probes).alias("p"))
               .select("tok", F.col("p.row").alias("row"),
                       F.col("p.bucket").alias("bucket")))
    return (cells.join(F.broadcast(queries), ["row", "bucket"])
            .groupBy("tok")
            .agg(F.min("cnt").alias("est_count"))
            .orderBy("tok"))


def vocab_kmv_distinct(spark: SparkSession, sf_dir: str,
                       k: int = 64) -> DataFrame:
    """Per-source vocabulary cardinality via a KMV (k-minimum-values)
    sketch — the fifth mergeable-sketch class beside HLL++/GK/Misra-
    Gries/Count-Min, and the one whose sketches also support set-size
    ALGEBRA (union/intersection estimates from merged minima), which HLL
    alone cannot give. Estimator: (k−1) / u_(k) where u_(k) is the k-th
    smallest hash mapped into (0,1) (Bar-Yossef et al. 2002).

    Spark shape: the token stream collapses FIRST to distinct
    (source, hash) — vocabulary-bounded, with map-side partial distinct —
    then the k smallest hashes per source come from the two-level
    salted min-k ladder (the :func:`kmv_set_ops` shape, applied here
    round 7): level 1 keeps k minima within each of 64 ``h % 64`` salt
    buckets (the per-task sort is vocab/64, and the salt count is the
    knob that scales the ladder out — a bare per-source window would
    sort a source's WHOLE vocabulary in one task at 100×), level 2
    merges the ≤ 64·k survivors per source (bounded window). Exact:
    the global k minima all survive level 1. Emits estimate vs exact
    distinct and the relative error so the bound is auditable; pytest
    pins |rel_err| ≲ 3/√k. xxhash64 has no DuckDB twin → rows-only
    driver check.
    """
    from pyspark.sql import Window

    from .relational import ld

    d = ld(spark, sf_dir, "documents")
    toks = d.select("source",
                    F.explode(F.split("text", " ")).alias("tok"))
    hashed = (toks.select("source", F.xxhash64("tok").alias("h"))
              .distinct())
    w1 = Window.partitionBy("source", "salt").orderBy("h")
    w2 = Window.partitionBy("source").orderBy("h")   # ≤ 64·k rows/source
    # map the signed 64-bit hash into (0,1): u = (h + 2^63 + 1) / 2^64 —
    # monotone, never 0 (min long maps to 2^-64)
    u = ((F.col("h").cast("double") + F.lit(2.0 ** 63) + F.lit(1.0))
         / F.lit(2.0 ** 64))
    kth = (hashed
           .withColumn("salt", F.pmod("h", F.lit(64)))
           .withColumn("rn", F.row_number().over(w1))
           .filter(F.col("rn") <= k)
           .withColumn("rn2", F.row_number().over(w2))
           .filter(F.col("rn2") == k)
           .select("source", u.alias("u_k")))
    exact = (hashed.groupBy("source")
             .agg(F.count(F.lit(1)).alias("exact_distinct")))
    est = F.lit(float(k - 1)) / F.col("u_k")
    return (exact.join(kth, "source", "left")
            .select("source", "exact_distinct",
                    F.when(F.col("u_k").isNull(),
                           F.col("exact_distinct").cast("double"))
                    .otherwise(est).alias("kmv_estimate"))
            .withColumn("rel_err",
                        (F.col("kmv_estimate")
                         - F.col("exact_distinct").cast("double"))
                        / F.col("exact_distinct").cast("double"))
            .orderBy("source"))


def kmv_set_ops(spark: SparkSession, sf_dir: str, k: int = 256,
                salt_buckets: int = 64) -> DataFrame:
    """KMV/theta-sketch SET ALGEBRA — the estimate HLL structurally
    cannot give: union AND intersection cardinalities of two user sets
    (clickers vs purchasers) from two mergeable k-minimum-values
    sketches. Union: merge both minima lists, re-take the k smallest,
    estimate (k−1)/θ. Intersection (theta rule): among hashes below the
    union's θ, count those present in BOTH sketches; estimate
    count/θ · 1 — plus the Jaccard estimate count/k.

    The k-smallest-per-set selection is TWO-LEVEL so no single reducer
    ever sorts a billion-user set: hashes first keep their k smallest
    within (set, h % 64) salt buckets (64-way parallel windows), then
    the survivors (≤ 64k rows per set) yield the true k minima — the
    standard distributed min-k ladder, exact because the global k
    smallest always survive their own bucket's cut. Exact baselines
    (countDistinct + join) ride beside the estimates so the error is
    auditable. xxhash64 has no DuckDB twin → rows-only; the pytest pins
    both estimators' error against the 3/√k band and replays the
    sketch in pure Python.
    """
    from pyspark.sql import Window

    from .relational import load_events

    e = load_events(spark, sf_dir)
    # a corrupted NULL user_id is not a set member: xxhash64(NULL) is a
    # REAL hash (the seed), which would smuggle one phantom member into
    # BOTH sketches while the exact set algebra (null-unsafe joins)
    # drops it — filter identity-less rows before ingest (r10)
    tagged = (e.filter(F.col("event_type").isin("click", "purchase")
                       & F.col("user_id").isNotNull())
              .select(F.col("event_type").alias("tag"),
                      F.xxhash64("user_id").alias("h"),
                      "user_id")
              .distinct())
    # two-level min-k ladder
    w1 = Window.partitionBy("tag", "salt").orderBy("h")
    w2 = Window.partitionBy("tag").orderBy("h")
    mins = (tagged
            .withColumn("salt", F.pmod("h", F.lit(salt_buckets)))
            .withColumn("rn", F.row_number().over(w1))
            .filter(F.col("rn") <= k)
            .withColumn("rn2", F.row_number().over(w2))
            .filter(F.col("rn2") <= k)
            .select("tag", "h")
            .localCheckpoint())        # consumed by union + both joins
    u = ((F.col("h").cast("double") + F.lit(2.0 ** 63) + F.lit(1.0))
         / F.lit(2.0 ** 64))
    wu = Window.orderBy("h")           # ≤ 2k rows — bounded window
    union_k = (mins.select("h").distinct()
               .withColumn("rn", F.row_number().over(wu))
               .filter(F.col("rn") <= k)
               .localCheckpoint())      # ≤k rows; θ + both estimates read it
    # small-set regime (standard KMV rule): fewer than k hashes in the
    # union → the sketch IS the set, θ=1 and the estimates are exact
    theta = union_k.agg(
        F.count(F.lit(1)).alias("n_union_hashes"),
        F.coalesce(F.max(F.when(F.col("rn") == k, u)), F.lit(1.0))
        .alias("theta"))
    a = mins.filter(F.col("tag") == "click").select("h")
    b = mins.filter(F.col("tag") == "purchase").select("h")
    common = (union_k.join(a, "h").join(b, "h")
              .crossJoin(F.broadcast(theta))
              .filter(u < F.col("theta"))
              .agg(F.count(F.lit(1)).alias("n_common")))
    # exact baselines (same NULL-member rule as the sketch ingest)
    au = e.filter((F.col("event_type") == "click")
                  & F.col("user_id").isNotNull()) \
          .select("user_id").distinct()
    bu = e.filter((F.col("event_type") == "purchase")
                  & F.col("user_id").isNotNull()) \
          .select("user_id").distinct()
    exact = (au.unionAll(bu).distinct().agg(
        F.count(F.lit(1)).alias("exact_union"))
        .crossJoin(F.broadcast(
            au.join(bu, "user_id").agg(
                F.count(F.lit(1)).alias("exact_intersect")))))
    small = F.col("n_union_hashes") < k
    return (exact.crossJoin(F.broadcast(theta))
            .crossJoin(F.broadcast(common))
            .select(
                "exact_union", "exact_intersect",
                F.when(small, F.col("n_union_hashes").cast("double"))
                .otherwise(F.lit(float(k - 1)) / F.col("theta"))
                .alias("est_union"),
                (F.col("n_common").cast("double") / F.col("theta"))
                .alias("est_intersect"),
                # 0 union hashes (both tag sets empty — a corrupted
                # shard's NULL event_type): Jaccard of Ø,Ø is undefined;
                # emit NULL, not an ANSI 0/0 abort
                F.when(F.col("n_union_hashes") > 0,
                       F.col("n_common").cast("double")
                       / F.least(F.lit(float(k)),
                                 F.col("n_union_hashes").cast("double")))
                .alias("est_jaccard")))

# ---------------------------------------------------------------------------
# Partial-oracle wrappers (round 8): each sketch entry's exact deterministic
# columns ride the driver's DuckDB hash gate, and the estimate collapses to
# an in-band boolean the oracle asserts as TRUE — if the sketch math drifts
# out of its pinned band, the Spark side emits FALSE and the hash gate goes
# red. The raw-estimate cores above stay untouched for the bound pytests.
# ---------------------------------------------------------------------------


def approx_distinct_counts_checked(spark, sf_dir) -> DataFrame:
    """Partial-oracle form of :func:`approx_distinct_counts`: exact
    per-priority distinct/row counts (DuckDB-recomputable) plus
    ``approx_in_band`` = |HLL − exact| ≤ max(2, 10%·exact), the same band
    ``tests/test_operators.py::test_hll_within_rsd_bound`` pins (5σ of
    the 2% target rsd)."""
    base = approx_distinct_counts(spark, sf_dir)
    in_band = (F.abs(F.col("approx_customers").cast("double")
                     - F.col("exact_customers").cast("double"))
               <= F.greatest(F.lit(2.0),
                             F.lit(0.10)
                             * F.col("exact_customers").cast("double")))
    return base.select("o_orderpriority", "exact_customers", "n_orders",
                       in_band.alias("approx_in_band"))


ORACLE_APPROX_DISTINCT_CHECKED = """
SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS exact_customers,
       COUNT(*) AS n_orders,
       TRUE AS approx_in_band
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def approx_hll_union_checked(spark, sf_dir) -> DataFrame:
    """Partial-oracle form of :func:`approx_hll_union`: the exact union
    cardinality and sum-of-parts (both DuckDB-recomputable) plus
    ``approx_in_band`` = |sketch-union estimate − exact| ≤
    max(2, 10%·exact)."""
    c = ld(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    o = ld(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    exact = (c.unionAll(o).distinct()
             .agg(F.count(F.lit(1)).alias("exact_union")))
    est = approx_hll_union(spark, sf_dir)
    in_band = (F.abs(F.col("approx_union_customers").cast("double")
                     - F.col("exact_union").cast("double"))
               <= F.greatest(F.lit(2.0),
                             F.lit(0.10)
                             * F.col("exact_union").cast("double")))
    return (exact.crossJoin(F.broadcast(est))
            .select("exact_union", "sum_of_parts",
                    in_band.alias("approx_in_band")))


ORACLE_APPROX_HLL_UNION_CHECKED = """
WITH u AS (
  SELECT c_custkey AS k FROM customer
  UNION
  SELECT o_custkey FROM orders
)
SELECT (SELECT COUNT(*) FROM u) AS exact_union,
       CAST((SELECT COUNT(DISTINCT c_custkey) FROM customer)
            + (SELECT COUNT(DISTINCT o_custkey) FROM orders)
            AS BIGINT) AS sum_of_parts,
       TRUE AS approx_in_band
"""


def vocab_kmv_distinct_checked(spark: SparkSession, sf_dir: str,
                               k: int = 64) -> DataFrame:
    """Partial-oracle form of :func:`vocab_kmv_distinct`: the exact
    per-source vocabulary size rides the hash gate (DuckDB recomputes it
    by splitting the text column — the xxhash64-distinct count equals the
    token-distinct count absent 64-bit collisions), and ``est_in_band``
    asserts the KMV estimator's pinned band: exact when the source holds
    fewer than k distinct tokens (the sketch IS the set), else
    |rel_err| ≤ 4/√(k−2) (tests/test_round6.py::TestKmvDistinct)."""
    if k <= 2:
        raise ValueError(
            f"vocab_kmv_distinct_checked requires k > 2 (got k={k}): "
            "the 4/sqrt(k-2) error band is undefined at k<=2")
    base = vocab_kmv_distinct(spark, sf_dir, k=k)
    bound = 4.0 / (k - 2) ** 0.5
    in_band = F.when(
        F.col("exact_distinct") < k,
        F.col("kmv_estimate") == F.col("exact_distinct").cast("double")) \
        .otherwise(F.abs(F.col("rel_err")) <= F.lit(bound))
    return base.select("source", "exact_distinct",
                       in_band.alias("est_in_band")).orderBy("source")


ORACLE_VOCAB_KMV_CHECKED = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
)
SELECT source, COUNT(DISTINCT tok) AS exact_distinct, TRUE AS est_in_band
FROM toks GROUP BY source ORDER BY source
"""


def kmv_set_ops_checked(spark: SparkSession, sf_dir: str, k: int = 256,
                        salt_buckets: int = 64) -> DataFrame:
    """Partial-oracle form of :func:`kmv_set_ops`: exact union /
    intersection cardinalities of the clicker/purchaser user sets ride
    the hash gate, and each estimator collapses to an in-band boolean
    (3/√k relative band for union — the pytest's band — and the same
    band on the union-scaled intersection / Jaccard errors; in the
    small-set regime (< k union hashes) the sketch IS the set and the
    booleans require exact equality)."""
    base = kmv_set_ops(spark, sf_dir, k=k, salt_buckets=salt_buckets)
    band = 3.0 / k ** 0.5
    eu = F.col("exact_union").cast("double")
    ei = F.col("exact_intersect").cast("double")
    exact_j = F.when(eu > 0, ei / eu).otherwise(F.lit(0.0))
    # small-set regime: fewer than k union hashes → the sketch IS the
    # set (θ=1 in the core), so the gate is exact equality, not the
    # band. est_jaccard and exact_j are the same single IEEE divide.
    small = eu < F.lit(float(k))
    return base.select(
        "exact_union", "exact_intersect",
        F.when(small, F.col("est_union") == eu)
        .otherwise(F.abs(F.col("est_union") - eu) <= F.lit(band) * eu)
        .alias("union_in_band"),
        F.when(small, F.col("est_intersect") == ei)
        .otherwise(F.abs(F.col("est_intersect") - ei) <= F.lit(band) * eu)
        .alias("intersect_in_band"),
        F.when(small, F.col("est_jaccard") == exact_j)
        .otherwise(F.abs(F.col("est_jaccard") - exact_j) <= F.lit(band))
        .alias("jaccard_in_band"))


ORACLE_KMV_SET_OPS_CHECKED = """
WITH a AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'click' AND user_id IS NOT NULL
), b AS (
  SELECT DISTINCT user_id FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL
)
SELECT (SELECT COUNT(*) FROM (SELECT user_id FROM a
                              UNION SELECT user_id FROM b))
         AS exact_union,
       (SELECT COUNT(*) FROM a JOIN b USING (user_id)) AS exact_intersect,
       TRUE AS union_in_band,
       TRUE AS intersect_in_band,
       TRUE AS jaccard_in_band
"""


def token_counts_countmin_checked(spark: SparkSession, sf_dir: str,
                                  depth: int = 4, width: int = 512,
                                  n_probe: int = 40) -> DataFrame:
    """Partial-oracle form of :func:`token_counts_countmin`: the probe
    set's EXACT counts ride the hash gate (DuckDB recomputes the
    alphabetically-first ``n_probe`` distinct tokens and their
    frequencies), plus the two CM invariants as booleans —
    ``est_ge_exact`` (a Count-Min estimate never undercounts,
    structural) and ``est_in_band`` (overcount ≤ 2N/width with
    probability 1 − 2^−depth; asserted with 2× slack at fixture
    scale)."""
    est = token_counts_countmin(spark, sf_dir, depth=depth, width=width,
                                n_probe=n_probe)
    d = ld(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok"))
    total = toks.agg(F.count(F.lit(1)).alias("n_tokens"))
    exact = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_count"))
    bound = F.lit(4.0) * F.col("n_tokens").cast("double") / F.lit(width)
    return (est.join(exact, "tok")
            .crossJoin(F.broadcast(total))
            .select("tok", "exact_count",
                    (F.col("est_count") >= F.col("exact_count"))
                    .alias("est_ge_exact"),
                    ((F.col("est_count") - F.col("exact_count"))
                     .cast("double") <= bound).alias("est_in_band"))
            .orderBy("tok"))


ORACLE_COUNTMIN_CHECKED = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), q AS (
  SELECT DISTINCT tok FROM toks ORDER BY tok LIMIT 40
)
SELECT t.tok, COUNT(*) AS exact_count,
       TRUE AS est_ge_exact, TRUE AS est_in_band
FROM toks t JOIN q USING (tok)
GROUP BY t.tok ORDER BY t.tok
"""
