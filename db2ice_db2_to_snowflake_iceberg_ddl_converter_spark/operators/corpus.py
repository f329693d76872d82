"""Corpus-level statistics for training-data curation: token-count
histograms and embedding-dimension covariance — the one-pass aggregate
scans a 100 TB pipeline runs before/after dedup to characterize the
corpus (EXT surface; the reference has no row plane).

Scale design: both operators are single hash-aggregation passes with
map-side partials — every executor emits a handful of partial-sum rows,
so the shuffle is O(buckets) / O(dims²) regardless of corpus size. The
covariance pass is the classic "d×d sufficient statistics in one scan"
shape that feeds PCA/whitening; at d=768 the partial state is ~2.4 MB
per task — still broadcast-class, never a driver bottleneck.

Float parity follows the module protocol in relational.py: per-row double
arithmetic (bitwise identical in both engines), per-row cast to
DECIMAL(28,6), exact order-independent decimal sum, one final cast to
double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .relational import DEC, ld, ld_docs


def corpus_token_histogram(spark: SparkSession, sf_dir: str,
                           width: int = 16) -> DataFrame:
    """Documents-per-token-count-bucket histogram with average char length.

    Token count = whitespace split (matches DuckDB ``string_split``);
    buckets are ``[k·width, (k+1)·width)`` via pure integer arithmetic.
    One groupBy on a derived int — partial aggs make the shuffle
    O(buckets) however large the corpus is.
    """
    d = ld(spark, sf_dir, "documents")
    ntok = F.size(F.split("text", " "))
    bucket = (ntok - F.pmod(ntok, F.lit(width))).alias("bucket_lo")
    return (d.select(bucket, "n_chars")
            .groupBy("bucket_lo")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 (F.sum(F.col("n_chars").cast(DEC)).cast("double")
                  / F.count(F.lit(1))).alias("avg_chars"))
            .orderBy("bucket_lo"))


ORACLE_TOKEN_HISTOGRAM = """
SELECT ntok - ntok % 16 AS bucket_lo,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_chars AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
         AS avg_chars
FROM (SELECT len(string_split(text, ' ')) AS ntok, n_chars FROM documents)
GROUP BY bucket_lo ORDER BY bucket_lo
"""


def corpus_top_tokens(spark: SparkSession, sf_dir: str,
                      k: int = 50) -> DataFrame:
    """Corpus-wide top-k most frequent tokens (vocabulary head — the scan
    that sizes stopword lists and tokenizer merges).

    Shape: explode → hash-aggregate with map-side partials (each executor
    emits one partial row per distinct token it saw, so the shuffle is
    O(vocabulary), not O(corpus)) → TakeOrderedAndProject for the top k
    (per-partition heads merge on the driver; no global sort). Ties break
    on the token string so the cut is deterministic."""
    d = ld(spark, sf_dir, "documents")
    return (d.select(F.explode(F.split("text", " ")).alias("token"))
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .orderBy(F.desc("n_occurrences"), "token")
            .limit(k))


ORACLE_TOP_TOKENS = """
SELECT token, COUNT(*) AS n_occurrences
FROM (SELECT UNNEST(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
ORDER BY n_occurrences DESC, token
LIMIT 50
"""


def corpus_tfidf_top_terms(spark: SparkSession, sf_dir: str,
                           k: int = 5) -> DataFrame:
    """Top-k highest-weighted terms per document under a BM25-style score
    ``tf · (N − df + 0.5) / (df + 0.5)``.

    The rarity weight is the BM25 idf core WITHOUT the log: Spark
    (Java ``Math.log``) and DuckDB (libm) disagree by 1 ulp on e.g.
    ln(3) — measured — and the correctness protocol hashes doubles
    bitwise, so the score sticks to rational arithmetic on exact
    integer-derived values (one multiply, one divide, identical op order
    in the oracle) which IEEE pins bitwise. The log is monotone in the
    ratio, so per-term rarity ORDERING matches classic idf; only the
    tf/idf mixing differs, and that choice is pinned, documented scoring
    semantics rather than an engine accident.

    Shape: explode → (doc, term) tf counts + term df counts (two hash
    aggs over the same exploded scan, partial-agg'd map-side), broadcast
    the O(vocabulary) df table back, one per-doc window for the top-k
    cut. At 100 TB the df table is the only reused state and it is
    vocabulary-sized, not corpus-sized.
    """
    from pyspark.sql import Window

    d = ld(spark, sf_dir, "documents")
    terms = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    df_tbl = terms.select("term", "doc_id").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df"))
    n_docs = d.select(F.countDistinct("doc_id").alias("n")).collect()[0]["n"]
    score = (F.col("tf").cast("double")
             * (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
             / (F.col("df") + F.lit(0.5)))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (tf.join(F.broadcast(df_tbl), "term")
            .select("doc_id", "term", "tf", "df", score.alias("score"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("doc_id", "term", "tf", "df", "score", "rk")
            .orderBy("doc_id", "rk"))


ORACLE_TFIDF_TOP_TERMS = """
WITH terms AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id)::DOUBLE AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf::DOUBLE * (n.n_docs - df.df + 0.5) / (df.df + 0.5) AS score
  FROM tf JOIN df USING (term), n),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rk
  FROM scored)
SELECT doc_id, term, tf, df, score, rk
FROM ranked WHERE rk <= 5 ORDER BY doc_id, rk
"""


#: The fixed demo query for :func:`retrieval_bm25_topk` — terms from the
#: fixture vocabulary so every SF has hits; the operator itself takes any
#: term list.
BM25_QUERY_TERMS = ["spark", "window", "hash", "vector", "merge"]


def retrieval_bm25_topk(spark: SparkSession, sf_dir: str,
                        k: int = 15) -> DataFrame:
    """Query-side BM25 retrieval: score every document against a fixed
    bag-of-terms query and return the top-k — the serving-shaped
    retrieval twin of :func:`corpus_tfidf_top_terms` (which weights
    terms *within* each doc; this ranks docs *for a query*, with the
    full BM25 tf-saturation + doc-length normalization that plain tf-idf
    lacks: k1=1.2, b=0.75).

    Portability: the idf keeps the log-free rational core
    ``(N − df + 0.5)/(df + 0.5)`` (same rationale as the tfidf entry —
    log is engine-libm and off-limits for hashed outputs; the ratio is
    monotone with classic idf so rankings agree). Every constant (2.2,
    1.2, 0.25, 0.75, 0.5) is a parsed literal on BOTH sides — never
    computed (1.2+1.0 at runtime need not equal the parsed literal
    2.2's double). Per-(doc,term) contributions are pure IEEE double
    chains in oracle-identical op order; the per-doc sum follows the
    decimal protocol (cast to DECIMAL(28,6), order-independent exact
    sum, one final cast) so Spark's unordered aggregation cannot drift
    from DuckDB's.

    Scale shape: the explode is filtered to the |Q| query terms BEFORE
    any aggregation, so the tf shuffle is O(matching docs × |Q|), not
    O(corpus tokens); df is a |Q|-row broadcast; N and total-token
    count are one bounded scalar collect (the allowed class); top-k is
    TakeOrderedAndProject — per-partition heads, no global sort. At
    100 TB nothing here is corpus-sized except the initial scan.
    """
    # ld_docs: NULL-text rows carry no terms and would turn ttok (and so
    # avgdl) into NULL -> a NoneType divide on a corrupted shard
    d = ld_docs(spark, sf_dir)
    scal = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(F.split("text", " "))).alias("ttok")).collect()[0]
    n_docs = scal["n"]
    if n_docs == 0:
        # BM25 over an empty corpus retrieves nothing — reachable
        # (empty shard/partition), not an error (empty-input contract;
        # found by the r9 empty probe)
        return spark.createDataFrame(
            [], "doc_id long, bm25 double, n_query_terms_hit long")
    avgdl = scal["ttok"] / n_docs  # exact ints -> one IEEE divide
    hits = (d.select("doc_id",
                     F.size(F.split("text", " ")).alias("dl"),
                     F.explode(F.split("text", " ")).alias("term"))
            .filter(F.col("term").isin(BM25_QUERY_TERMS)))
    tf = hits.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("dl").alias("dl"))
    df_tbl = (hits.select("term", "doc_id").distinct()
              .groupBy("term").agg(F.count(F.lit(1)).alias("df")))
    idf = ((F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
           / (F.col("df") + F.lit(0.5)))
    tfd = F.col("tf").cast("double")
    denom = tfd + F.lit(1.2) * (F.lit(0.25)
                                + F.lit(0.75) * F.col("dl").cast("double")
                                / F.lit(avgdl))
    contrib = idf * (tfd * F.lit(2.2)) / denom
    return (tf.join(F.broadcast(df_tbl), "term")
            .select("doc_id", contrib.alias("c"))
            .groupBy("doc_id")
            .agg(F.sum(F.col("c").cast(DEC)).cast("double").alias("bm25"),
                 F.count(F.lit(1)).alias("n_query_terms_hit"))
            .orderBy(F.desc("bm25"), "doc_id")
            .limit(k))


ORACLE_BM25_TOPK = """
WITH scal AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
         CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / COUNT(*)
           AS avgdl
  FROM documents WHERE text IS NOT NULL),
hits AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl,
         UNNEST(string_split(text, ' ')) AS term
  FROM documents WHERE text IS NOT NULL),
fh AS (
  SELECT * FROM hits
  WHERE term IN ('spark', 'window', 'hash', 'vector', 'merge')),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf, MAX(dl) AS dl
  FROM fh GROUP BY doc_id, term),
df AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM fh GROUP BY term),
scored AS (
  SELECT tf.doc_id,
         ((scal.nd - df.df + 0.5) / (df.df + 0.5))
           * (CAST(tf.tf AS DOUBLE) * 2.2)
           / (CAST(tf.tf AS DOUBLE)
              + 1.2 * (0.25 + 0.75 * CAST(tf.dl AS DOUBLE) / scal.avgdl))
           AS c
  FROM tf JOIN df USING (term), scal)
SELECT doc_id,
       CAST(SUM(CAST(c AS DECIMAL(28,6))) AS DOUBLE) AS bm25,
       COUNT(*) AS n_query_terms_hit
FROM scored GROUP BY doc_id
ORDER BY bm25 DESC, doc_id LIMIT 15
"""


def embedding_covariance(spark: SparkSession, sf_dir: str,
                         dims: int = 6) -> DataFrame:
    """Population covariance of the first ``dims`` embedding dimensions in
    ONE aggregation pass (sufficient statistics: n, Σxᵢ, Σxᵢxⱼ), emitted
    long-form as (dim_i, dim_j, cov) for i ≤ j.

    cov(i,j) = Σxᵢxⱼ/n − (Σxᵢ/n)(Σxⱼ/n), with each Σ an exact decimal sum
    of per-row double products and the final expression evaluated in the
    same IEEE op order as the oracle — bitwise-identical output.
    """
    from .relational import ld_vecs

    # ld_vecs: a single NaN/huge component would abort the exact decimal
    # product sums (poisoned-values contract); no-op on real fixtures
    e = ld_vecs(spark, sf_dir)

    def x(i: int) -> F.Column:
        return F.element_at("embedding", i).cast("double")

    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(x(i).cast(DEC)).cast("double").alias(f"s{i}")
             for i in range(1, dims + 1)]
    aggs += [F.sum((x(i) * x(j)).cast(DEC)).cast("double").alias(f"p{i}_{j}")
             for i in range(1, dims + 1) for j in range(i, dims + 1)]
    row = e.agg(*aggs)

    n = F.col("n")
    pairs = F.array(*[
        F.struct(F.lit(i).alias("dim_i"), F.lit(j).alias("dim_j"),
                 (F.col(f"p{i}_{j}") / n
                  - (F.col(f"s{i}") / n) * (F.col(f"s{j}") / n))
                 .alias("cov"))
        for i in range(1, dims + 1) for j in range(i, dims + 1)
    ])
    return (row.select(F.explode(pairs).alias("p")).select("p.*")
            .orderBy("dim_i", "dim_j"))


def _oracle_embedding_covariance(dims: int = 6) -> str:
    sums = ["COUNT(*) AS n"]
    sums += [f"CAST(SUM(CAST(CAST(embedding[{i}] AS DOUBLE) "
             f"AS DECIMAL(28,6))) AS DOUBLE) AS s{i}"
             for i in range(1, dims + 1)]
    sums += [f"CAST(SUM(CAST(CAST(embedding[{i}] AS DOUBLE) * "
             f"CAST(embedding[{j}] AS DOUBLE) "
             f"AS DECIMAL(28,6))) AS DOUBLE) AS p{i}_{j}"
             for i in range(1, dims + 1) for j in range(i, dims + 1)]
    branches = [
        f"SELECT {i} AS dim_i, {j} AS dim_j, "
        f"p{i}_{j}/n - (s{i}/n)*(s{j}/n) AS cov FROM s"
        for i in range(1, dims + 1) for j in range(i, dims + 1)
    ]
    return (f"WITH s AS (SELECT {', '.join(sums)} FROM embeddings\n"
            "            WHERE embedding IS NOT NULL AND len(list_filter("
            "embedding, x -> x IS NULL OR isnan(x) OR"
            " abs(x) > 1e6)) = 0)\n"
            + "\nUNION ALL ".join(branches)
            + "\nORDER BY dim_i, dim_j")


ORACLE_EMBEDDING_COVARIANCE = _oracle_embedding_covariance()


def corpus_curate(spark: SparkSession, sf_dir: str,
                  min_quality: float = 60.0) -> DataFrame:
    """The composite curation pass a training-data pipeline actually runs:
    exact-dedup (keep min doc_id per normalized text) ∘ language gate
    (predicted English) ∘ quality gate (score ≥ ``min_quality``) in ONE
    job — one scan, one window over the dedup key, everything else narrow.

    At 100 TB this single-job composition is the difference between three
    materialized intermediate corpora and none: the gates are Catalyst
    predicates fused into the scan stage, and the dedup window shuffles
    once on the normalized-text hash. Reuses the exact expression
    definitions of text_quality_score / text_langid / dedup_exact_docs, so
    its oracle is their composition too.
    """
    from pyspark.sql import Window

    from .textstats import LANG_MARKERS, _PUNCT_CHARS

    d = ld(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    distinct_words = F.array_distinct(words)
    n_tokens = F.size(words)
    ttr = F.size(distinct_words).cast("double") / n_tokens.cast("double")
    hits = {
        lang: F.size(F.array_intersect(
            distinct_words, F.array(*[F.lit(w) for w in markers])))
        for lang, markers in LANG_MARKERS.items()
    }
    predicted = (
        F.when((hits["en"] >= hits["es"]) & (hits["en"] >= hits["de"])
               & (hits["en"] >= hits["fr"]) & (hits["en"] > 0), "en")
        .when((hits["es"] >= hits["de"]) & (hits["es"] >= hits["fr"])
              & (hits["es"] > 0), "es")
        .when((hits["de"] >= hits["fr"]) & (hits["de"] > 0), "de")
        .when(hits["fr"] > 0, "fr")
        .otherwise("und"))
    punct = (F.length("text")
             - F.length(F.translate("text", _PUNCT_CHARS, ""))).cast("double")
    # NULL for empty text, not an ANSI 0/0 abort (poisoned contract)
    punct_ratio = punct / F.nullif(F.length("text"), F.lit(0))
    length_ok = (F.col("n_chars") >= 100) & (F.col("n_chars") <= 5000)
    score = (F.when(length_ok, 40).otherwise(10)
             + ttr * 30
             + F.when(hits["en"] > 0, 20).otherwise(0)
             + F.when(punct_ratio <= 0.1, 10).otherwise(0))
    w = Window.partitionBy(F.trim(F.lower("text"))).orderBy("doc_id")
    return (d.select("doc_id",
                     predicted.alias("predicted_lang"),
                     score.alias("quality_score"),
                     n_tokens.alias("n_tokens"),
                     F.row_number().over(w).alias("dup_rank"))
            .filter((F.col("dup_rank") == 1)
                    & (F.col("predicted_lang") == "en")
                    & (F.col("quality_score") >= min_quality))
            .select("doc_id", "quality_score", "n_tokens")
            .orderBy("doc_id"))


ORACLE_CORPUS_CURATE = """
WITH t AS (
  SELECT doc_id, text, n_chars,
         string_split(text, ' ') AS w,
         list_distinct(string_split(text, ' ')) AS dw,
         ROW_NUMBER() OVER (PARTITION BY TRIM(LOWER(text))
                            ORDER BY doc_id) AS dup_rank
  FROM documents
), scored AS (
  SELECT doc_id, len(w) AS n_tokens, dup_rank,
         len(list_intersect(dw, ['the','a','of','and','is'])) AS en_h,
         len(list_intersect(dw, ['el','la','de','y','es'])) AS es_h,
         len(list_intersect(dw, ['der','die','das','und','ist'])) AS de_h,
         len(list_intersect(dw, ['le','la','et','est','un'])) AS fr_h,
         (CASE WHEN n_chars >= 100 AND n_chars <= 5000 THEN 40 ELSE 10 END)
         + (len(dw)::DOUBLE / len(w)) * 30
         + (CASE WHEN len(list_intersect(dw, ['the','a','of','and','is'])) > 0
                 THEN 20 ELSE 0 END)
         + (CASE WHEN (LENGTH(text) - LENGTH(replace(replace(replace(replace(replace(replace(text,
             '.', ''), ',', ''), ';', ''), ':', ''), '!', ''), '?', '')))::DOUBLE
             / LENGTH(text) <= 0.1 THEN 10 ELSE 0 END) AS quality_score
  FROM t
)
SELECT doc_id, quality_score, n_tokens
FROM scored
WHERE dup_rank = 1
  AND en_h >= es_h AND en_h >= de_h AND en_h >= fr_h AND en_h > 0
  AND quality_score >= 60
ORDER BY doc_id
"""


def corpus_bigram_counts(spark: SparkSession, sf_dir: str,
                         min_count: int = 20, k: int = 100) -> DataFrame:
    """Corpus-wide bigram language-model counts: top-k adjacent token
    pairs occurring at least ``min_count`` times (the count table an
    n-gram LM / tokenizer-merge pass starts from).

    Shape: bigram generation is a per-row ``zip_with`` over the token
    array (pure Catalyst codegen — each document emits its own bigrams
    with no Python), then explode → hash aggregate. Map-side partials
    make the shuffle O(distinct bigrams), not O(corpus tokens); the
    ``min_count`` cutoff prunes the heavy tail before the final
    TakeOrderedAndProject, so the driver fetch is k rows. Ties break on
    the bigram string.

    The oracle generates pairs positionally (lag over ordinal-indexed
    unnest) — different formulation, same pair multiset.

    Oracle coupling: the defaults ``min_count=20`` / ``k=100`` are baked
    into the oracle as constants (same trap as scale_zorder_zvalues) —
    non-default values are ad-hoc only, with no parity claim.
    """
    d = ld(spark, sf_dir, "documents")
    # tokenize once per row (r12 optimization round): the old inline
    # form re-ran split(text) four times per row (both zip_with sides
    # and both size() bounds); same pair multiset
    bigrams = F.expr(
        "zip_with(slice(w, 1, size(w) - 1), "
        "         slice(w, 2, size(w) - 1), "
        "         (a, b) -> concat(a, ' ', b))")
    return (d.withColumn("w", F.split("text", " "))
            .select(F.explode(bigrams).alias("bigram"))
            .groupBy("bigram")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= min_count)
            .orderBy(F.desc("n"), "bigram")
            .limit(k))


ORACLE_BIGRAM_COUNTS = """
WITH toks AS (
  SELECT doc_id,
         UNNEST(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
), pairs AS (
  SELECT LAG(tok) OVER (PARTITION BY doc_id ORDER BY i) AS a, tok AS b
  FROM toks
)
SELECT a || ' ' || b AS bigram, COUNT(*) AS n
FROM pairs WHERE a IS NOT NULL
GROUP BY bigram
HAVING COUNT(*) >= 20
ORDER BY n DESC, bigram
LIMIT 100
"""


def corpus_bpe_merge_pairs(spark: SparkSession, sf_dir: str,
                           k: int = 50) -> DataFrame:
    """First BPE iteration over the corpus: the top-k adjacent CHARACTER
    pairs weighted by word frequency — the merge candidates a byte-pair
    tokenizer trains from.

    The classic BPE scaling trick, expressed relationally: counting runs
    over the VOCABULARY (token, freq) — O(|V|·token_len) pair rows —
    never over the raw corpus, because each token's pairs are weighted by
    its corpus frequency from the first aggregation. Two hash aggregates
    (corpus→vocab, vocab→pairs), both with map-side partials; pure
    Catalyst expressions throughout. The per-token pair generator guards
    ``sequence`` against 1-char tokens (start > stop would emit a
    DESCENDING sequence, not an empty one).
    """
    d = ld(spark, sf_dir, "documents")
    vocab = (d.select(F.explode(F.split("text", " ")).alias("tok"))
             .groupBy("tok").agg(F.count(F.lit(1)).alias("freq")))
    pair_expr = F.when(
        F.length("tok") >= 2,
        F.expr("transform(sequence(1, length(tok) - 1), "
               "          i -> substring(tok, i, 2))")
    ).otherwise(F.array().cast("array<string>"))
    return (vocab.select(F.explode(pair_expr).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("weight"))
            .orderBy(F.desc("weight"), "pair")
            .limit(k))


ORACLE_BPE_MERGE_PAIRS = """
WITH vocab AS (
  SELECT tok, COUNT(*) AS freq
  FROM (SELECT UNNEST(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
), pairs AS (
  SELECT substr(tok, i, 2) AS pair, freq
  FROM vocab, UNNEST(range(1, length(tok))) AS t(i)
  WHERE length(tok) >= 2
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS weight
FROM pairs GROUP BY pair
ORDER BY weight DESC, pair
LIMIT 50
"""


def corpus_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation summary a 100 TB run emits before training: per
    (source, predicted language) bucket — document volume, exact-dup
    volume and rate, quality-gate pass count, and token totals. Composes
    the engine's own primitives (``textstats.predicted_lang_expr``,
    ``textstats.quality_score_expr``, md5 exact-dup detection) into the
    one table a data-curation review actually reads.

    Scale shape: every per-document derivation (language, quality, token
    count, content digest) is a scan-level Catalyst expression; dup
    detection is ONE hash aggregation on the md5 digest joined back on
    the digest (uniform shuffle key by construction); the final rollup is
    keyed by (source, predicted_lang) — dimension-sized output. All
    aggregates are exact integers; the single dup-rate division runs once
    on exact operands, so the oracle hash-matches bitwise. (md5, not
    xxhash64, precisely so DuckDB CAN mirror the digest.)
    """
    from .textstats import predicted_lang_expr, quality_score_expr

    # NULL text: no language, no tokens, no quality to report —
    # ld_docs' corrupted-shard contract (r11 nulldoc gate), mirrored in
    # the oracle
    d = ld_docs(spark, sf_dir)
    per_doc = d.select(
        "source",
        predicted_lang_expr().alias("predicted_lang"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        (quality_score_expr() >= 60).cast("int").alias("quality_pass"),
        F.md5("text").alias("h"))
    dup_counts = per_doc.groupBy("h").agg(
        F.count(F.lit(1)).alias("n_same"))
    return (per_doc.join(dup_counts, "h")
            .groupBy("source", "predicted_lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum((F.col("n_same") > 1).cast("int"))
                 .alias("n_dup_docs"),
                 F.sum("quality_pass").alias("n_quality_pass"),
                 F.sum("n_tokens").alias("total_tokens"))
            .withColumn("dup_rate",
                        F.col("n_dup_docs").cast("double")
                        / F.col("n_docs"))
            .select("source", "predicted_lang", "n_docs", "n_dup_docs",
                    "dup_rate", "n_quality_pass", "total_tokens")
            .orderBy("source", "predicted_lang"))


ORACLE_CURATION_REPORT = """
WITH per_doc AS (
  SELECT source, text, n_chars,
         string_split(text, ' ') AS w,
         list_distinct(string_split(text, ' ')) AS dw,
         md5(text) AS h
  FROM documents WHERE text IS NOT NULL
), scored AS (
  SELECT source, h, len(w) AS n_tokens,
         CASE WHEN en_h >= es_h AND en_h >= de_h AND en_h >= fr_h
                   AND en_h > 0 THEN 'en'
              WHEN es_h >= de_h AND es_h >= fr_h AND es_h > 0 THEN 'es'
              WHEN de_h >= fr_h AND de_h > 0 THEN 'de'
              WHEN fr_h > 0 THEN 'fr'
              ELSE 'und' END AS predicted_lang,
         CASE WHEN
           (CASE WHEN n_chars >= 100 AND n_chars <= 5000 THEN 40 ELSE 10 END)
           + (len(dw)::DOUBLE / len(w)) * 30
           + (CASE WHEN len(list_intersect(dw,
                      ['the','a','of','and','is'])) > 0 THEN 20 ELSE 0 END)
           + (CASE WHEN (LENGTH(text) - LENGTH(replace(replace(replace(
                 replace(replace(replace(text,
                 '.', ''), ',', ''), ';', ''), ':', ''), '!', ''), '?', ''))
                 )::DOUBLE / LENGTH(text) <= 0.1 THEN 10 ELSE 0 END)
           >= 60 THEN 1 ELSE 0 END AS quality_pass
  FROM (
    SELECT source, text, n_chars, w, dw, h,
           len(list_intersect(dw, ['the','a','of','and','is'])) AS en_h,
           len(list_intersect(dw, ['el','la','de','y','es'])) AS es_h,
           len(list_intersect(dw, ['der','die','das','und','ist'])) AS de_h,
           len(list_intersect(dw, ['le','la','et','est','un'])) AS fr_h
    FROM per_doc)
), dup AS (
  SELECT *, COUNT(*) OVER (PARTITION BY h) AS n_same FROM scored
)
SELECT source, predicted_lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_same > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_docs,
       CAST(SUM(CASE WHEN n_same > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         / COUNT(*) AS dup_rate,
       CAST(SUM(quality_pass) AS BIGINT) AS n_quality_pass,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM dup
GROUP BY source, predicted_lang
ORDER BY source, predicted_lang
"""


def _bpe_merge_fold(a: str, b: str) -> F.Column:
    """One BPE merge rule applied to a ``syms`` array column as a
    left-to-right non-overlapping fold: append each symbol, except when
    the incoming symbol is ``b`` and the last accumulated symbol is an
    UNCONSUMED ``a`` — then replace that last element with the merged
    symbol. (A just-merged ``ab`` never re-matches as ``a``.) Shared by
    the trainer (``bpe_train_merges``) and the encoder
    (``bpe_encode_stats``) so both apply rules with identical semantics.
    """
    al, bl, ml = F.lit(a), F.lit(b), F.lit(a + b)
    return F.aggregate(
        "syms",
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == al)
            & (s == bl),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(ml)))
        .otherwise(F.concat(acc, F.array(s))))


def _bpe_merge_fold_multi(rules: list) -> F.Column:
    """Several MUTUALLY-DISJOINT merge rules applied in ONE left-to-right
    fold (r12 optimization): the rule set rides a map literal
    ``left → (right, merged)`` and each incoming symbol consults the map
    through the accumulated last element — one pass over ``syms`` instead
    of one stacked fold per rule, so a k-rule census batch costs one
    plan/codegen unit and one array traversal instead of k.

    Equivalence to sequentially applying each rule with
    :func:`_bpe_merge_fold` (the proof the pytests pin):

    * the rules come from one ``_bpe_safe_batch`` batch, so their symbol
      sets {a, b} are mutually disjoint — one rule's merge substitutes
      ``a b → ab`` and never creates, destroys, or re-adjacencies
      another rule's ``(c, d)`` occurrences (a substitution replaces two
      adjacent symbols with one new one; c and d can end up adjacent to
      ``ab``, never to each other);
    * merged symbols live only in the ACCUMULATOR (incoming symbols are
      the original array), so the only cross-rule interaction is a
      just-created ``m_i`` matching some rule's LEFT as the accumulated
      last element. ``m_i`` can never equal a LATER-accepted rule's left
      (the dirty set already contains ``a+b`` when later pairs are
      vetted), and callers must split a batch whenever ``m_i`` equals an
      EARLIER-accepted left (see the grouping in ``_bpe_train``) — with
      that exclusion the map lookup can only ever fire the same merges
      the sequential folds would.
    """
    if len(rules) == 1:
        return _bpe_merge_fold(*rules[0])
    m = F.create_map(*[part for a, b in rules
                       for part in (F.lit(a),
                                    F.struct(F.lit(b).alias("r"),
                                             F.lit(a + b).alias("m")))])

    def step(acc: F.Column, s: F.Column) -> F.Column:
        # try_element_at, not element_at (r13, ADVICE): the guard below
        # relies on NULL-on-miss for keys absent from the rule map, and
        # try_* makes that contract explicit and version-stable (ANSI
        # element_at on a missing MAP key raised in older Sparks)
        rule = F.try_element_at(m, F.element_at(acc, -1))
        return F.when(
            (F.size(acc) > 0) & rule.isNotNull() & (s == rule["r"]),
            F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1),
                     F.array(rule["m"]))
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate("syms", F.expr("CAST(array() AS array<string>)"),
                       step)


def _bpe_fold_groups(batch: list) -> list:
    """Split one safe batch into maximal runs applicable as a single
    combined fold: start a new group when a rule's merged string equals
    an EARLIER group member's left symbol (the one in-pass hazard — a
    just-created ``m_i`` would re-trigger that earlier rule, which the
    sequential trainer, having already applied it, would not). The
    converse collision (a left equal to an earlier merged string) cannot
    occur inside a safe batch: the dirty set holds ``a+b`` when later
    pairs are vetted."""
    groups: list[list] = []
    for a, b, _w in batch:
        if groups and all(a + b != ga for ga, _gb in groups[-1]):
            groups[-1].append((a, b))
        else:
            groups.append([(a, b)])
    return groups


def bpe_train_merges(spark: SparkSession, sf_dir: str,
                     n_merges: int = 10) -> DataFrame:
    """Train ``n_merges`` BPE merge rules over the corpus — the real
    iterative tokenizer-training loop, not just the single pair census
    (``corpus_bpe_merge_pairs``): start from characters, repeatedly take
    the highest-weighted adjacent symbol pair (weight = Σ token
    frequency over all its occurrences, adjacent-overlapping counted,
    ties broken on (left, right)) and merge it left-to-right
    non-overlapping in every vocabulary entry.

    Scale shape: the corpus is touched ONCE (the token-frequency
    aggregation); every census round then runs over the VOCABULARY table
    (explode adjacent pairs → hash agg → bounded TakeOrdered), which is
    bounded by distinct-token count no matter the corpus size — the same
    reason real BPE trainers are feasible at 100 TB. The evolving symbols
    column is localCheckpoint-ed every census round to keep lineage flat.

    Batched rounds (r4 verdict item 7): each census fetches the top
    ``_BPE_SCAN + 1`` pairs (same one-round-trip cost as fetching one)
    and applies every merge the census PROVES sequential training would
    emit next — see ``_bpe_safe_batch`` for the proof sketch — so the
    number of blocking driver round-trips drops from ``n_merges`` to
    ``n_merges / batch`` with the merge SEQUENCE bit-identical to the
    one-at-a-time trainer (pytest pins it against the pure-Python
    reference).

    Iterative algorithm → rows-only driver check; the pytest pins the
    full merge sequence against an independent pure-Python BPE reference
    on the same vocabulary.
    """
    merges, _ = _bpe_train(spark, sf_dir, n_merges)
    return spark.createDataFrame(
        merges, "step int, left string, right string, merged string, "
                "weight long")


def _bpe_train(spark: SparkSession, sf_dir: str, n_merges: int):
    """Shared trainer core: returns (merge list, final vocabulary frame
    with columns (tok, syms, freq)). The ``tok`` key rides along through
    every fold so ``bpe_encode_stats`` can reuse the trainer's FINAL
    symbols directly instead of re-applying every rule to a second
    vocabulary build — the encode pass costs one broadcast probe, zero
    extra fold jobs."""
    d = ld(spark, sf_dir, "documents")
    vocab = (d.select(F.explode(F.split("text", " ")).alias("tok"))
             .filter(F.length("tok") > 0)
             .groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
             .select("tok", F.split("tok", "").alias("syms"), "freq")
             .localCheckpoint())    # vocab-sized; re-read every merge round

    merges: list = []
    folds_since_ckpt = 0
    while len(merges) < n_merges:
        pairs = vocab.select(
            "freq",
            F.explode(F.arrays_zip(
                F.slice("syms", 1, F.size("syms") - 1),
                F.slice("syms", 2, F.size("syms") - 1))).alias("p")) \
            .select(F.col("p.0").alias("left"),
                    F.col("p.1").alias("right"), "freq")
        top = (pairs.groupBy("left", "right")
               .agg(F.sum("freq").alias("weight"))
               .orderBy(F.desc("weight"), "left", "right")
               .limit(_BPE_SCAN + 1).collect())
        if not top:
            break
        batch = _bpe_safe_batch(
            [(r["left"], r["right"], r["weight"]) for r in top],
            scanned_all=len(top) <= _BPE_SCAN,
            known_merged={m[3] for m in merges})
        batch = batch[:n_merges - len(merges)]
        for a, b, w in batch:
            merges.append((len(merges) + 1, a, b, a + b, w))
        # r12: one combined fold per hazard-free group instead of one
        # stacked fold per rule — k disjoint rules cost one plan/codegen
        # unit and one array traversal (see _bpe_merge_fold_multi for
        # the equivalence argument, _bpe_fold_groups for the split).
        for group in _bpe_fold_groups(batch):
            vocab = vocab.select("tok",
                                 _bpe_merge_fold_multi(group).alias("syms"),
                                 "freq")
            folds_since_ckpt += 1
            # lineage cap: a checkpoint is a blocking job, so take one
            # per 8 APPLIED folds (one census can accept up to _BPE_SCAN
            # merges, so a per-census cadence would let ~2·_BPE_SCAN
            # folds of analyzed plan stack up) and always before
            # returning — ≤ 8 stacked folds of plan, codegen-sized.
            if folds_since_ckpt >= 8:
                vocab = vocab.localCheckpoint()
                folds_since_ckpt = 0
        if len(merges) >= n_merges and folds_since_ckpt:
            vocab = vocab.localCheckpoint()
    return merges, vocab


#: Census pairs fetched per round (the +1 row is the stop sentinel).
_BPE_SCAN = 32


def _bpe_safe_batch(top: list, scanned_all: bool,
                    known_merged: set) -> list:
    """From one census's top pairs (desc weight, ties (left, right)),
    return the longest PREFIX of merges that provably equals what
    one-at-a-time training would emit.

    Greedy scan in rank order, accepting a pair while its symbols avoid
    the dirty set (symbols of earlier-accepted pairs plus their merged
    strings); the scan STOPS at the first dirty pair — with stop weight
    ``w_stop`` — because pairs ranked past a dirty pair can be outranked
    by its post-merge census weight.

    Why the retained prefix is exactly the sequential sequence: applying
    an accepted merge (a,b)→Z only changes census weights of pairs
    touching {a, b, Z} — all dirty, so ranked at/after the stop, weight
    ≤ w_stop. A pair newly created by the merge gains at most
    weight(x,a) ≤ w_stop occurrences; it can carry EXISTING census
    weight on top only if the string Z already names a census symbol.
    Symbols start as single characters, so every multi-char symbol came
    from a prior merge — ``known_merged`` is the complete collision
    registry, no cluster round-trip needed. Hence each retained pair
    needs ``weight > w_stop`` (strict, so lexicographic ties can't flip
    the order), escalating to ``> 2·w_stop`` once an earlier batch merge
    had a colliding string. Mutually disjoint accepted pairs can't
    create or destroy each other's occurrences, so each retained pair is
    still the running maximum at its sequential turn. If the scan
    consumed the ENTIRE census with no conflict (``scanned_all``), any
    would-be new pair (x,Z) requires an (x,a) census pair, which would
    have conflicted — the whole batch is safe unfiltered. The global max
    (first pair) is what sequential training picks unconditionally, so
    at least one merge is always returned and the loop always
    progresses.
    """
    accepted: list = []
    dirty: set = set()
    w_stop = None
    for a, b, w in top:
        if a == b:
            # SELF-PAIR stop (found by the hypothesis property test): an
            # a==b merge mints new pairs out of its OWN overlapping
            # occurrences — "ccc" under (c,c) folds to [cc, c], creating
            # a (cc, c) adjacency with no other c-containing census pair
            # around to trigger the dirty stop — so a mid-batch
            # self-pair cannot be proven safe. Treat it exactly like a
            # dirty pair (stop BEFORE it, its weight bounds everything
            # ranked at or after it); as the global max it is
            # unconditionally what sequential training picks, so it
            # forms a batch of one.
            if not accepted:
                return [(a, b, w)]
            w_stop = w
            break
        if a in dirty or b in dirty:
            w_stop = w
            break
        accepted.append((a, b, w))
        dirty.update((a, b, a + b))
    else:
        if not scanned_all:
            # scan truncated by the fetch limit with no conflict: the
            # sentinel (last fetched row) bounds everything unscanned.
            accepted, last = accepted[:-1], accepted[-1]
            w_stop = last[2]
    if w_stop is None:
        return accepted
    out: list = []
    collision_seen = False
    for i, p in enumerate(accepted):
        bound = 2 * w_stop if collision_seen else w_stop
        if i > 0 and p[2] <= bound:
            break
        out.append(p)
        if p[0] + p[1] in known_merged:
            collision_seen = True
    return out


def corpus_chunk_overlap(spark: SparkSession, sf_dir: str,
                         size: int = 64, stride: int = 48) -> DataFrame:
    """Sliding-window document chunking with overlap — the context-window
    splitter every LLM training/RAG pipeline runs before tokenization:
    each document becomes ceil(n_tokens/stride) chunks of up to ``size``
    tokens, consecutive chunks sharing ``size - stride`` tokens.

    Scale shape: a pure per-row NARROW transform — ``sequence()`` over
    the start offsets, one explode, ``slice`` + ``array_join`` per chunk;
    no shuffle, no Python, whole-stage codegen end-to-end. Output fanout
    is bounded by n_tokens/stride per document, so a 100 TB corpus chunks
    in one map pass and the writer's partitioning is inherited unchanged.

    Oracle coupling: ``size=64`` / ``stride=48`` are baked into the
    oracle as constants — non-default values are ad-hoc only, with no
    parity claim.
    """
    # NULL text: nothing to chunk — ld_docs' corrupted-shard contract
    # (r11 nulldoc gate), mirrored in the oracle
    d = ld_docs(spark, sf_dir)
    toks = F.split("text", " ")
    return (d.select("doc_id", toks.alias("toks"))
            .select("doc_id",
                    F.expr(f"sequence(1, greatest(size(toks), 1), {stride})")
                    .alias("starts"), "toks")
            .select("doc_id", F.explode("starts").alias("start"), "toks")
            .select("doc_id",
                    ((F.col("start") - 1) / stride).cast("int")
                    .alias("chunk_id"),
                    F.col("start").alias("start_token"),
                    F.slice("toks", F.col("start"), F.lit(size))
                    .alias("chunk"))
            .select("doc_id", "chunk_id", "start_token",
                    F.size("chunk").alias("n_tokens"),
                    F.array_join("chunk", " ").alias("chunk_text"))
            .orderBy("doc_id", "chunk_id"))


ORACLE_CHUNK_OVERLAP = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE text IS NOT NULL
), starts AS (
  SELECT doc_id, t,
         UNNEST(range(1, greatest(len(t), 1) + 1, 48)) AS start
  FROM toks
)
SELECT doc_id,
       CAST((start - 1) / 48 AS INT) AS chunk_id,
       start AS start_token,
       CAST(least(start + 63, len(t)) - start + 1 AS INT) AS n_tokens,
       array_to_string(list_slice(t, start, least(start + 63, len(t))), ' ')
         AS chunk_text
FROM starts
ORDER BY doc_id, chunk_id
"""


def corpus_doc_lm_coverage(spark: SparkSession, sf_dir: str,
                           min_count: int = 20) -> DataFrame:
    """Per-document bigram language-model coverage — the exact-integer
    perplexity proxy a quality-filtering pass scores with: how many of a
    document's adjacent token pairs appear in the corpus-level bigram
    table (``corpus_bigram_counts``'s shape, cutoff ``min_count``), and
    how much corpus mass those hits carry. Low coverage flags boilerplate,
    mojibake, and wrong-language text without any float log-prob (the
    log-domain score is a consumer-side transform of these integers).

    Scale shape: the LM table is cutoff-pruned (heavy-tail bigrams never
    leave the map side) and broadcast — the corpus-side probe is a
    map-only broadcast hash join; the per-doc rollup re-aggregates rows
    that are already co-located per input row, so map-side partial
    aggregation collapses the shuffle to O(docs). All outputs are exact
    BIGINTs — bitwise-portable by construction.

    Oracle coupling: ``min_count=20`` is baked into the oracle as a
    constant — non-default values are ad-hoc only, with no parity claim.
    """
    # tokenize once per row (r12 optimization round): the old inline
    # form re-ran split(text) four times per row; same pair multiset
    d = (ld(spark, sf_dir, "documents")
         .withColumn("w", F.split("text", " ")))
    bigrams = F.expr(
        "zip_with(slice(w, 1, size(w) - 1), "
        "         slice(w, 2, size(w) - 1), "
        "         (a, b) -> concat(a, ' ', b))")
    lm = (d.select(F.explode(bigrams).alias("bigram"))
          .groupBy("bigram").agg(F.count(F.lit(1)).alias("lm_n"))
          .filter(F.col("lm_n") >= min_count))
    # explode_outer (r4 advice): a document with <2 tokens has an EMPTY
    # bigram array — a plain explode would drop the row entirely and a
    # quality-filtering consumer could not tell "no bigrams" from "not
    # scored". It survives here with total_bigrams = 0.
    doc_bigrams = d.select("doc_id",
                           F.explode_outer(bigrams).alias("bigram"))
    return (doc_bigrams.join(F.broadcast(lm), "bigram", "left")
            .groupBy("doc_id")
            .agg(F.count("bigram").alias("total_bigrams"),
                 F.count("lm_n").alias("matched_bigrams"),
                 F.coalesce(F.sum("lm_n"), F.lit(0)).alias("matched_mass"))
            .orderBy("doc_id"))


ORACLE_DOC_LM_COVERAGE = """
WITH toks AS (
  SELECT doc_id,
         UNNEST(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS i
  FROM documents
), pairs AS (
  SELECT doc_id,
         LAG(tok) OVER (PARTITION BY doc_id ORDER BY i) || ' ' || tok
           AS bigram
  FROM toks
  QUALIFY LAG(tok) OVER (PARTITION BY doc_id ORDER BY i) IS NOT NULL
), lm AS (
  SELECT bigram, COUNT(*) AS lm_n FROM pairs
  GROUP BY bigram HAVING COUNT(*) >= 20
)
SELECT d.doc_id,
       COUNT(p.bigram) AS total_bigrams,
       COUNT(lm.lm_n) AS matched_bigrams,
       CAST(COALESCE(SUM(lm.lm_n), 0) AS BIGINT) AS matched_mass
FROM documents d
LEFT JOIN pairs p ON d.doc_id = p.doc_id
LEFT JOIN lm ON p.bigram = lm.bigram
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


def bpe_encode_stats(spark: SparkSession, sf_dir: str,
                     n_merges: int = 10) -> DataFrame:
    """Apply trained BPE merges to the corpus — the tokenizer-APPLICATION
    pass that closes the loop opened by ``bpe_train_merges``: every
    document's per-token symbol counts after encoding, rolled up to
    (doc_id, n_tokens, n_symbols, n_chars) — the table a token-budgeted
    training pipeline reads to size its shards.

    Scale shape: the classic encode trick, expressed relationally —
    merges are applied to the DISTINCT-TOKEN table (O(|V|) rows no matter
    the corpus size), never to the raw text; each rule is the shared
    ``_bpe_merge_fold`` (pure Catalyst, identical semantics to training),
    with a localCheckpoint every few rules to keep the expression tree
    codegen-sized. The corpus pass is then a broadcast probe of the tiny
    (token → n_syms) map plus one per-doc rollup whose shuffle collapses
    to O(docs) via map-side partial aggregation.

    Iterative training feeds the encode (driver-looped) → rows-only
    driver check; the pytest pins per-token encodings against an
    independent pure-Python BPE encoder using the same rules.
    """
    _, trained_vocab = _bpe_train(spark, sf_dir, n_merges)
    # The trainer already applied every rule to the full distinct-token
    # vocabulary (the `tok` key rides along exactly for this): its final
    # symbols ARE the encoding — no second vocabulary build, no re-fold.
    tok_syms = trained_vocab.select("tok", F.size("syms").alias("n_syms"))

    d = ld(spark, sf_dir, "documents")

    doc_toks = (d.select("doc_id", F.explode(F.split("text", " "))
                 .alias("tok"))
                .filter(F.length("tok") > 0))
    return (doc_toks.join(F.broadcast(tok_syms), "tok")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum("n_syms").alias("n_symbols"),
                 F.sum(F.length("tok")).alias("n_chars"))
            .orderBy("doc_id"))


def bpe_train_merges_checked(spark: SparkSession, sf_dir: str,
                             n_merges: int = 10) -> DataFrame:
    """Partial-oracle form of :func:`bpe_train_merges` (round 9): the
    FIRST merge is pure SQL — the adjacent-character pair with the
    highest frequency-weighted count over the distinct-token vocabulary
    (ties to ascending (left, right)) — so its (left, right, merged,
    weight) ride the DuckDB hash gate together with the merge count,
    anchoring the vocabulary build, pair census and tie-break order.
    The remaining sequence collapses to two structural booleans the
    oracle asserts: ``merged_identity`` (merged ≡ left||right on every
    step) and ``steps_contiguous`` (steps are exactly 1..n). The full
    sequence stays pinned by the pure-Python BPE pytest on the raw
    core."""
    m = bpe_train_merges(spark, sf_dir, n_merges)
    first = m.filter(F.col("step") == 1).select(
        F.col("left").alias("step1_left"),
        F.col("right").alias("step1_right"),
        F.col("merged").alias("step1_merged"),
        F.col("weight").alias("step1_weight"))
    stats = m.agg(
        F.count(F.lit(1)).alias("n_merges"),
        F.max((F.col("merged") != F.concat("left", "right")).cast("int"))
        .alias("any_bad_merge"),
        F.sum("step").alias("step_sum"))
    return (first.crossJoin(F.broadcast(stats))
            .select("n_merges", "step1_left", "step1_right",
                    "step1_merged", "step1_weight",
                    (F.col("any_bad_merge") == 0).alias("merged_identity"),
                    (F.col("step_sum")
                     == F.col("n_merges") * (F.col("n_merges") + 1) / 2)
                    .alias("steps_contiguous")))


ORACLE_BPE_TRAIN_CHECKED = """
WITH vocab AS (
  SELECT tok, COUNT(*) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE length(tok) > 0 GROUP BY tok),
pairs AS (
  SELECT substr(v.tok, g.i, 1) AS l, substr(v.tok, g.i + 1, 1) AS r,
         v.freq
  FROM vocab v,
       LATERAL (SELECT UNNEST(generate_series(1, length(v.tok) - 1))
                AS i) g),
top1 AS (
  SELECT l, r, CAST(SUM(freq) AS BIGINT) AS w
  FROM pairs GROUP BY l, r
  ORDER BY w DESC, l, r LIMIT 1)
SELECT CAST(10 AS BIGINT) AS n_merges,
       l AS step1_left, r AS step1_right, l || r AS step1_merged,
       w AS step1_weight,
       TRUE AS merged_identity,
       TRUE AS steps_contiguous
FROM top1
"""


def bpe_encode_stats_checked(spark: SparkSession, sf_dir: str,
                             n_merges: int = 10) -> DataFrame:
    """Partial-oracle form of :func:`bpe_encode_stats` (round 9): the
    per-doc token and character counts are exact (DuckDB twins), so
    they ride the hash gate with doc_id, and the merge-dependent symbol
    count collapses to its compression-bounds invariant as an
    oracle-asserted boolean: n_tokens ≤ n_symbols ≤ n_chars (every
    token is at least one symbol and merging never grows past the
    character count). Per-token encodings stay pinned by the
    pure-Python encoder pytest on the raw core."""
    base = bpe_encode_stats(spark, sf_dir, n_merges)
    return base.select(
        "doc_id", "n_tokens", "n_chars",
        ((F.col("n_symbols") >= F.col("n_tokens"))
         & (F.col("n_symbols") <= F.col("n_chars")))
        .alias("symbols_in_bounds")).orderBy("doc_id")


ORACLE_BPE_ENCODE_CHECKED = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(length(tok)) AS BIGINT) AS n_chars,
       TRUE AS symbols_in_bounds
FROM toks WHERE length(tok) > 0
GROUP BY doc_id ORDER BY doc_id
"""


def corpus_build_pipeline(spark: SparkSession, sf_dir: str,
                          size: int = 64, stride: int = 48,
                          n_shards: int = 8) -> DataFrame:
    """The END-TO-END corpus build a 100 TB training-data run executes,
    composed as ONE Spark job with zero driver round-trips between
    stages: language gate ∘ quality gate ∘ exact+near dedup ∘ mixture
    downsample ∘ chunking ∘ shard assignment → per-shard export manifest.

    Stage reuse (each stage is the SAME expression its standalone
    registry entry runs, so this entry proves they compose):
    - gates: ``textstats.predicted_lang_expr`` == 'en' and
      ``textstats.quality_score_expr`` ≥ 60 (text_langid /
      text_quality_score);
    - dedup: keep min doc_id per TRIM(LOWER(text)) group
      (corpus_curate's normalized window — exact duplicates are a subset
      of normalized ones, so one window implements both gates);
    - mixture: keep iff 16-bit md5('mix:'||text) bucket < source weight
      (corpus_mixture_sample's predicate — even sources 100%, odd 25%);
    - chunking: corpus_chunk_overlap's (size=64, stride=48) grid,
      computed in CLOSED FORM per document (size(sequence) chunks,
      ``aggregate`` over starts for token totals) — no explode, so
      chunk accounting adds zero rows to the plan;
    - sharding: export_training_shards' md5('shard:'||text) bucket % 8
      with the md5 hex as the portable within-shard shuffle key.

    Plan shape at scale: one scan (all gates are scan-level Catalyst
    predicates after the dedup window), ONE window shuffle on the
    normalized-text key, ONE final hash aggregation keyed by shard —
    uniform by md5 construction, no skew. Everything between is narrow.
    All manifest aggregates are exact integers / hex strings → the
    DuckDB oracle hash-matches bitwise.

    Oracle coupling: the defaults (size=64, stride=48, n_shards=8,
    quality ≥ 60, even/odd mixture weights) are baked into the oracle as
    constants — non-default values are ad-hoc only, with no parity
    claim.
    """
    from pyspark.sql import Window

    from .textstats import predicted_lang_expr, quality_score_expr
    from .traindata import _hex_bucket

    d = ld(spark, sf_dir, "documents")
    dup_w = Window.partitionBy(F.trim(F.lower("text"))).orderBy("doc_id")
    # try_cast: a source with no trailing number yields '' here, and an
    # ANSI cast would abort the whole job (r9 dupflood sweep); NULL
    # falls through pmod/when to the 0.25 branch deterministically
    src_num = F.expr(
        "try_cast(regexp_extract(source, '(\\\\d+)$', 1) AS int)")
    weight_hi = F.when(F.pmod(src_num, F.lit(2)) == 0, F.lit(65536)) \
        .otherwise(F.lit(16384))                       # 1.0 vs 0.25
    mix_bucket = _hex_bucket(F.md5(F.concat(F.lit("mix:"),
                                            F.col("text"))), 4)
    shard_h = F.md5(F.concat(F.lit("shard:"), F.col("text")))

    survivors = (d.select(
        "doc_id", "text",
        predicted_lang_expr().alias("predicted_lang"),
        quality_score_expr().alias("quality_score"),
        (mix_bucket < weight_hi).alias("mix_keep"),
        shard_h.alias("h"),
        F.row_number().over(dup_w).alias("dup_rank"))
        .filter((F.col("dup_rank") == 1)
                & (F.col("predicted_lang") == "en")
                & (F.col("quality_score") >= 60.0)
                & F.col("mix_keep")))

    # hoist the token COUNT once per row (r12 optimization round): the
    # old inline form re-ran split(text) inside the aggregate lambda —
    # once per CHUNK, O(len²/stride) per doc; identical arithmetic
    survivors = survivors.withColumn(
        "nw", F.greatest(F.size(F.split("text", " ")), F.lit(1)))
    starts = F.expr(f"sequence(1, nw, {stride})")
    chunk_tokens = F.expr(
        f"aggregate(sequence(1, nw, "
        f"{stride}), 0, (acc, s) -> acc + least({size}, "
        f"nw - s + 1))")
    per_doc = survivors.select(
        F.pmod(_hex_bucket(F.col("h"), 4), F.lit(n_shards)).alias("shard"),
        "h",
        F.size(starts).alias("n_chunks"),
        chunk_tokens.alias("chunk_tokens"))

    return (per_doc.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chunks").cast("long").alias("n_chunks"),
                 F.sum("chunk_tokens").cast("long")
                 .alias("total_chunk_tokens"),
                 F.min("h").alias("first_key"),
                 F.max("h").alias("last_key"))
            .orderBy("shard"))


ORACLE_BUILD_PIPELINE = """
WITH t AS (
  SELECT doc_id, source, text, n_chars,
         string_split(text, ' ') AS w,
         list_distinct(string_split(text, ' ')) AS dw,
         ROW_NUMBER() OVER (PARTITION BY TRIM(LOWER(text))
                            ORDER BY doc_id) AS dup_rank
  FROM documents
), scored AS (
  SELECT doc_id, source, text, w,
         dup_rank,
         len(list_intersect(dw, ['the','a','of','and','is'])) AS en_h,
         len(list_intersect(dw, ['el','la','de','y','es'])) AS es_h,
         len(list_intersect(dw, ['der','die','das','und','ist'])) AS de_h,
         len(list_intersect(dw, ['le','la','et','est','un'])) AS fr_h,
         (CASE WHEN n_chars >= 100 AND n_chars <= 5000 THEN 40 ELSE 10 END)
         + (len(dw)::DOUBLE / len(w)) * 30
         + (CASE WHEN len(list_intersect(dw, ['the','a','of','and','is'])) > 0
                 THEN 20 ELSE 0 END)
         + (CASE WHEN (LENGTH(text) - LENGTH(replace(replace(replace(replace(replace(replace(text,
             '.', ''), ',', ''), ';', ''), ':', ''), '!', ''), '?', '')))::DOUBLE
             / LENGTH(text) <= 0.1 THEN 10 ELSE 0 END) AS quality_score
  FROM t
), survivors AS (
  SELECT doc_id, text, len(w) AS n_tok,
         md5('shard:' || text) AS h
  FROM scored
  WHERE dup_rank = 1
    AND en_h >= es_h AND en_h >= de_h AND en_h >= fr_h AND en_h > 0
    AND quality_score >= 60
    AND ((strpos('0123456789abcdef', md5('mix:' || text)[1:1]) - 1) * 4096
         + (strpos('0123456789abcdef', md5('mix:' || text)[2:2]) - 1) * 256
         + (strpos('0123456789abcdef', md5('mix:' || text)[3:3]) - 1) * 16
         + (strpos('0123456789abcdef', md5('mix:' || text)[4:4]) - 1))
        < (CASE WHEN TRY_CAST(regexp_extract(source, '(\\d+)$', 1) AS INTEGER)
                     % 2 = 0
                THEN 65536 ELSE 16384 END)
), chunked AS (
  SELECT doc_id, h,
         ((strpos('0123456789abcdef', h[1:1]) - 1) * 4096
          + (strpos('0123456789abcdef', h[2:2]) - 1) * 256
          + (strpos('0123456789abcdef', h[3:3]) - 1) * 16
          + (strpos('0123456789abcdef', h[4:4]) - 1)) % 8 AS shard,
         len(range(1, greatest(n_tok, 1) + 1, 48)) AS n_chunks,
         (SELECT SUM(least(64, n_tok - s + 1))
          FROM UNNEST(range(1, greatest(n_tok, 1) + 1, 48)) AS u(s))
           AS chunk_tokens
  FROM survivors
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
       CAST(SUM(chunk_tokens) AS BIGINT) AS total_chunk_tokens,
       MIN(h) AS first_key, MAX(h) AS last_key
FROM chunked
GROUP BY shard
ORDER BY shard
"""


def corpus_decontaminate(spark: SparkSession, sf_dir: str,
                         n: int = 5, bench_mod: int = 97) -> DataFrame:
    """Benchmark decontamination DECISION pass — the per-document
    keep/drop manifest over the WHOLE corpus (every doc appears, with
    ``contaminated`` false and n_grams possibly 0), i.e. the filter a
    pipeline actually applies. Complements
    ``traindata.contamination_ngram_overlap``, which is the pair-level
    AUDIT of the same hygiene problem (which train doc collided with
    which eval doc, contaminated pairs only) — different output
    contract, same broadcast-probe plan family. The recipe is the GPT-3
    appendix-C / PaLM / Llama n-gram overlap scan (8–13-grams there;
    5-grams here because the fixture documents are short).

    The "benchmark" is a deterministic slice of the same table
    (doc_id ≡ 0 mod ``bench_mod``) so the fixture needs no extra file —
    in production it's the eval-suite corpus, which is the KEY scale
    asymmetry this plan exploits: benchmark n-grams are a few million
    rows however big the training corpus is, so they broadcast, and the
    100 TB side is probed map-side with NO shuffle of corpus grams. The
    per-doc rollup then re-aggregates rows already co-located per input
    row (map-side partials, O(docs) shuffle). Corpus docs too short to
    have any n-gram survive via explode_outer with n_grams = 0 — same
    no-silent-drop rule as corpus_doc_lm_coverage.

    Oracle coupling: ``n=5`` / ``bench_mod=97`` are baked into the
    oracle as constants — non-default values are ad-hoc only.

    Loaded via ``ld_py`` for the same reason as
    ``contamination_ngram_overlap``: the gram transform + distinct +
    explode is heavy JVM row work feeding a broadcast probe with no key
    exchange to parallelize it — the fan-out is the only source of
    parallelism on single-row-group fixtures (measured there:
    2.31 s → 0.96 s at sf0.1; ~1.6 s → ~0.9 s here).
    """
    from .relational import ld_py

    # tokenize once per row (r12 optimization round, same fix as
    # dedup_substring_spans): the inline split in the transform lambda
    # re-split the document per gram — O(len²); same gram sets
    d = (ld_py(spark, sf_dir, "documents")
         .withColumn("w", F.split("text", " ")))
    grams = F.when(
        F.size("w") >= n,
        F.expr(f"array_distinct(transform("
               f"sequence(1, size(w) - {n - 1}), "
               f"i -> array_join(slice(w, i, {n}), ' ')))")
    ).otherwise(F.array().cast("array<string>"))

    bench = (d.filter(F.col("doc_id") % bench_mod == 0)
             .select(F.explode(grams).alias("gram"))
             .distinct()
             .withColumn("hit", F.lit(1)))
    corp = (d.filter(F.col("doc_id") % bench_mod != 0)
            .select("doc_id", F.explode_outer(grams).alias("gram")))
    return (corp.join(F.broadcast(bench), "gram", "left")
            .groupBy("doc_id")
            .agg(F.count("gram").alias("n_grams"),
                 F.count("hit").alias("n_contaminated_grams"))
            .select("doc_id", "n_grams", "n_contaminated_grams",
                    (F.col("n_contaminated_grams") > 0)
                    .alias("contaminated"))
            .orderBy("doc_id"))


ORACLE_DECONTAMINATE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), g AS (
  SELECT doc_id,
         list_distinct([array_to_string(w[i:i+4], ' ')
                        FOR i IN range(1, greatest(len(w) - 4, 0) + 1)])
           AS grams
  FROM t
), bench AS (
  SELECT DISTINCT UNNEST(grams) AS gram FROM g WHERE doc_id % 97 = 0
), corp AS (
  SELECT doc_id, UNNEST(grams) AS gram FROM g WHERE doc_id % 97 <> 0
)
SELECT d.doc_id,
       COUNT(c.gram) AS n_grams,
       COUNT(b.gram) AS n_contaminated_grams,
       COUNT(b.gram) > 0 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
LEFT JOIN corp c ON d.doc_id = c.doc_id
LEFT JOIN bench b ON c.gram = b.gram
GROUP BY d.doc_id
ORDER BY d.doc_id
"""


def corpus_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, §A1.1) —
    the rule-based pre-filter large pipelines run BEFORE any model-based
    scoring, adapted to the fixture's scale: word-count band, mean word
    length band, and minimum distinct-stopword hits. Emits every rule's
    verdict alongside the metrics so a curation review can see WHY a
    document failed, plus the conjunction ``passes``.

    Scale shape: pure per-row Catalyst arithmetic over one scan — no
    shuffle, no Python, whole-stage codegen end-to-end; the final
    orderBy is presentation-only. mean_word_len is one exact-integer
    division done in the same IEEE op order in the oracle.

    Fixture-adapted bands (the paper's 50–100k word band would pass
    everything here): words ∈ [20, 200], mean word length ∈ [3, 10],
    ≥ 2 distinct English stopwords.
    """
    from .textstats import LANG_MARKERS

    d = ld(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words)
    # chars excluding the n_words-1 separators, over n_words
    mean_wl = ((F.col("n_chars") - (n_words - F.lit(1))).cast("double")
               / n_words.cast("double"))
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(words),
        F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])))
    r_wc = (n_words >= 20) & (n_words <= 200)
    r_mwl = (mean_wl >= 3.0) & (mean_wl <= 10.0)
    r_stop = stop_hits >= 2
    return (d.select("doc_id",
                     n_words.alias("n_words"),
                     mean_wl.alias("mean_word_len"),
                     stop_hits.alias("n_stopword_hits"),
                     r_wc.alias("rule_word_count"),
                     r_mwl.alias("rule_mean_word_len"),
                     r_stop.alias("rule_stopwords"),
                     (r_wc & r_mwl & r_stop).alias("passes"))
            .orderBy("doc_id"))


ORACLE_GOPHER_RULES = """
WITH t AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_words,
         (n_chars - (len(string_split(text, ' ')) - 1))::DOUBLE
           / len(string_split(text, ' ')) AS mean_word_len,
         len(list_intersect(list_distinct(string_split(text, ' ')),
                            ['the','a','of','and','is'])) AS n_stopword_hits
  FROM documents
)
SELECT doc_id, n_words, mean_word_len, n_stopword_hits,
       n_words >= 20 AND n_words <= 200 AS rule_word_count,
       mean_word_len >= 3.0 AND mean_word_len <= 10.0
         AS rule_mean_word_len,
       n_stopword_hits >= 2 AS rule_stopwords,
       (n_words >= 20 AND n_words <= 200)
         AND (mean_word_len >= 3.0 AND mean_word_len <= 10.0)
         AND n_stopword_hits >= 2 AS passes
FROM t
ORDER BY doc_id
"""


def corpus_lang_drift_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-distribution drift between two corpus slices — the
    chi-square homogeneity check a curation pipeline runs between
    ingests to catch a source silently changing its language mix (the
    fixture slices deterministically: even doc_ids = "old" snapshot,
    odd = "new"). Emits per language both slice counts and the
    chi-square contribution Σ (o−e)²/e over its two cells, plus the
    share-of-corpus delta; the consumer sums contributions and compares
    against the χ² critical value driver-side.

    Chi-square instead of KL divergence BY DESIGN: KL needs log, and
    Spark (Java Math.log) vs DuckDB (libm) differ by 1 ulp on some
    inputs — measured on this repo, see corpus_tfidf_top_terms — while
    (o−e)²/e is plain IEEE +,−,×,÷ on exact-integer-derived operands,
    bitwise identical in both engines when the op order is pinned (it
    is: e = (row·col)/grand, each term divided before summing).

    Scale shape: one hash aggregation keyed by language (map-side
    partials → O(languages) shuffle), a 1-row totals aggregate broadcast
    back by cross join, then narrow arithmetic. Language-cardinality
    output however big the corpus.
    """
    d = ld(spark, sf_dir, "documents")
    counts = (d.groupBy("lang")
              .agg(F.sum((F.col("doc_id") % 2 == 0).cast("long"))
                   .alias("n_old"),
                   F.sum((F.col("doc_id") % 2 == 1).cast("long"))
                   .alias("n_new")))
    totals = counts.agg(F.sum("n_old").alias("tot_old"),
                        F.sum("n_new").alias("tot_new"))
    row_tot = F.col("n_old") + F.col("n_new")
    grand = F.col("tot_old") + F.col("tot_new")
    e_old = (row_tot * F.col("tot_old")).cast("double") \
        / grand.cast("double")
    e_new = (row_tot * F.col("tot_new")).cast("double") \
        / grand.cast("double")
    chi2 = ((F.col("n_old") - e_old) * (F.col("n_old") - e_old) / e_old
            + (F.col("n_new") - e_new) * (F.col("n_new") - e_new) / e_new)
    share_delta = (F.col("n_new").cast("double")
                   / F.col("tot_new").cast("double")
                   - F.col("n_old").cast("double")
                   / F.col("tot_old").cast("double"))
    # a one-sided corpus (every doc in one half of the id-parity split)
    # makes the expected counts 0 — NULL, not an ANSI divide error;
    # all-true whenever both halves hold at least one document
    both = (F.col("tot_old") > 0) & (F.col("tot_new") > 0)
    return (counts.crossJoin(F.broadcast(totals))
            .select("lang", "n_old", "n_new",
                    F.when(both, chi2).alias("chi2_contrib"),
                    F.when(both, share_delta).alias("share_delta"))
            .orderBy("lang"))


ORACLE_LANG_DRIFT_CHI2 = """
WITH counts AS (
  SELECT lang,
         SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_old,
         SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS n_new
  FROM documents GROUP BY lang
), totals AS (
  SELECT SUM(n_old) AS tot_old, SUM(n_new) AS tot_new FROM counts
)
SELECT lang, CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
       (n_old - ((n_old + n_new) * tot_old)::DOUBLE
                / (tot_old + tot_new)::DOUBLE)
       * (n_old - ((n_old + n_new) * tot_old)::DOUBLE
                  / (tot_old + tot_new)::DOUBLE)
       / (((n_old + n_new) * tot_old)::DOUBLE / (tot_old + tot_new)::DOUBLE)
       + (n_new - ((n_old + n_new) * tot_new)::DOUBLE
                  / (tot_old + tot_new)::DOUBLE)
       * (n_new - ((n_old + n_new) * tot_new)::DOUBLE
                  / (tot_old + tot_new)::DOUBLE)
       / (((n_old + n_new) * tot_new)::DOUBLE / (tot_old + tot_new)::DOUBLE)
         AS chi2_contrib,
       n_new::DOUBLE / tot_new::DOUBLE - n_old::DOUBLE / tot_old::DOUBLE
         AS share_delta
FROM counts, totals
ORDER BY lang
"""


def corpus_source_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift per source: for each
    ingest source, the KS statistic between its document-length
    (``n_chars``) distribution and the rest of the corpus — the numeric
    complement to ``corpus_lang_drift_chi2`` (a source whose scraper
    started truncating or concatenating pages shifts its length CDF long
    before its language mix moves).

    Exact, not sampled, yet scale-safe: the corpus is first COMPACTED to
    (source, n_chars) → count (one hash aggregate, map-side partials, so
    the shuffle is O(sources × distinct lengths), corpus-size-independent).
    Every later step — the sources × lengths grid (a cross join of two
    already-aggregated frames), the per-source cumulative window
    (partitioned by source, never global), and the rest-CDF derived as
    Σ_s cum_s(x) − cum_s — runs on that compacted frame. At 100 TB you
    would bin lengths first; the pipeline is unchanged.

    Float protocol: all cumulative counts are exact integers; each CDF is
    ONE double division and the KS contribution one subtraction, pinned in
    the same order in the oracle. The significance flag avoids sqrt by
    squaring the classic α=0.05 threshold 1.358·√((m+n)/(m·n)):
    ks² · m·n > 1.358² · (m+n), all rational.

    ``ks_at`` is the smallest length attaining the maximum (deterministic
    argmax; both engines filter on bitwise-equal doubles).
    """
    from pyspark.sql import Window

    d = ld(spark, sf_dir, "documents", fanout=False)
    # the compaction is referenced by every later frame (srcs/xs/grid →
    # cum → g and k → per and at); localCheckpoint pins it so the corpus
    # is scanned and aggregated ONCE — without it the final plan re-derives
    # the compaction per reference (42 parquet scans at sf0.001, measured)
    c = (d.groupBy("source", F.col("n_chars").alias("x"))
         .agg(F.count(F.lit(1)).alias("cnt"))
         .localCheckpoint())
    srcs = c.groupBy("source").agg(F.sum("cnt").alias("n_src"))
    xs = c.select("x").distinct()
    grid = (srcs.crossJoin(xs)
            .join(c, ["source", "x"], "left")
            .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0))))
    w = (Window.partitionBy("source").orderBy("x")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # (sources × distinct-x)-bounded grid; pinned — the pooled rollup and
    # the KS join would each replay the per-source cumsum window otherwise
    cum = grid.withColumn("cum_s", F.sum("cnt").over(w)).localCheckpoint()
    g = cum.groupBy("x").agg(F.sum("cum_s").alias("cum_g"))
    tot = srcs.agg(F.sum("n_src").alias("n_total"))
    k = (cum.join(g, "x").crossJoin(F.broadcast(tot))
         .withColumn("n_rest", F.col("n_total") - F.col("n_src"))
         # a single-source corpus (one shard, one doc) has n_rest = 0
         # and no rest-CDF to compare against: KS is undefined there →
         # NULL, not an ANSI ÷0 job abort (the source then drops from
         # the output — nothing to drift against). Guard all-true on
         # any ≥2-source corpus, so oracle hashes are unchanged.
         .withColumn(
             "ks", F.when(
                 F.col("n_rest") > 0,
                 F.abs(
                     F.col("cum_s").cast("double")
                     / F.col("n_src").cast("double")
                     - (F.col("cum_g") - F.col("cum_s")).cast("double")
                     / F.col("n_rest").cast("double"))))
         .localCheckpoint())    # grid-sized; max-KS rollup + argmax read it
    per = (k.groupBy("source", "n_src", "n_rest")
           .agg(F.max("ks").alias("ks_stat")))
    at = (k.select("source", "x", "ks")
          .join(per, ["source"])
          .filter(F.col("ks") == F.col("ks_stat"))
          .groupBy("source")
          .agg(F.min("x").alias("ks_at")))
    flag = (F.col("ks_stat") * F.col("ks_stat")
            * (F.col("n_src") * F.col("n_rest")).cast("double")
            > 1.844164 * (F.col("n_src") + F.col("n_rest")).cast("double"))
    return (per.join(at, "source")
            .select("source", F.col("n_src").cast("long").alias("n_src"),
                    "ks_stat", F.col("ks_at").cast("long").alias("ks_at"),
                    flag.alias("drift_flag"))
            .orderBy("source"))


ORACLE_SOURCE_KS_DRIFT = """
WITH c AS (
  SELECT source, n_chars AS x, COUNT(*) AS cnt
  FROM documents GROUP BY source, n_chars
), srcs AS (
  SELECT source, SUM(cnt) AS n_src FROM c GROUP BY source
), xs AS (
  SELECT DISTINCT x FROM c
), grid AS (
  SELECT s.source, s.n_src, xs.x, COALESCE(c.cnt, 0) AS cnt
  FROM srcs s CROSS JOIN xs
  LEFT JOIN c ON c.source = s.source AND c.x = xs.x
), cum AS (
  SELECT source, n_src, x, cnt,
         SUM(cnt) OVER (PARTITION BY source ORDER BY x
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum_s
  FROM grid
), g AS (
  SELECT x, SUM(cum_s) AS cum_g FROM cum GROUP BY x
), tot AS (
  SELECT SUM(n_src) AS n_total FROM srcs
), k AS (
  SELECT cum.source, cum.n_src, cum.x,
         tot.n_total - cum.n_src AS n_rest,
         ABS(CAST(cum.cum_s AS DOUBLE) / CAST(cum.n_src AS DOUBLE)
             - CAST(g.cum_g - cum.cum_s AS DOUBLE)
               / CAST(tot.n_total - cum.n_src AS DOUBLE)) AS ks
  FROM cum JOIN g ON g.x = cum.x CROSS JOIN tot
), per AS (
  SELECT source, n_src, n_rest, MAX(ks) AS ks_stat
  FROM k GROUP BY source, n_src, n_rest
), at AS (
  SELECT k.source, MIN(k.x) AS ks_at
  FROM k JOIN per ON per.source = k.source AND k.ks = per.ks_stat
  GROUP BY k.source
)
SELECT per.source, CAST(per.n_src AS BIGINT) AS n_src, per.ks_stat,
       CAST(at.ks_at AS BIGINT) AS ks_at,
       per.ks_stat * per.ks_stat
         * CAST(per.n_src * per.n_rest AS DOUBLE)
         > 1.844164 * CAST(per.n_src + per.n_rest AS DOUBLE) AS drift_flag
FROM per JOIN at ON at.source = per.source
ORDER BY per.source
"""


def corpus_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-level content overlap: for every pair of ingest
    sources, the Jaccard similarity and containment of their DISTINCT
    word-trigram sets — the redundancy map a mixture designer consults
    before weighting sources (two mirrors of the same crawl → near-1
    Jaccard → downweight one; containment ≫ Jaccard exposes a subset
    mirror). Source-level twin of the doc-level dedup_ngram_jaccard.

    Scale shape: the corpus collapses FIRST to distinct (source, trigram)
    — one hash aggregate, map-side partials, O(sources × gram-vocab)
    survivors regardless of corpus size. The pair intersection is a
    self-join on trigram over that compacted frame; each gram shared by k
    sources emits C(k,2) ≤ C(|sources|,2) pair rows, so the join output
    is bounded by vocab × pairs, never corpus². The full pair grid (cross
    join of two O(sources) frames) keeps zero-overlap pairs visible.

    Trigrams via native slice/zip_with (JVM codegen, no Python), with
    greatest(n-2, 0) guarding short docs — Spark's sequence() descends
    when stop < start, so the slice form is the safe empty-array path.
    Jaccard and containment are each ONE double division of exact ints,
    pinned identically in the oracle.
    """
    d = ld(spark, sf_dir, "documents", fanout=False)
    tri = F.expr(
        "zip_with(zip_with(slice(w, 1, greatest(size(w) - 2, 0)),"
        "                  slice(w, 2, greatest(size(w) - 2, 0)),"
        "                  (x, y) -> concat(x, ' ', y)),"
        "         slice(w, 3, greatest(size(w) - 2, 0)),"
        "         (x, y) -> concat(x, ' ', y))")
    # three consumers (sizes, both join sides) — pin the distinct pass so
    # the corpus explode+dedup runs once, not per reference
    g = (d.select("source", F.split("text", " ").alias("w"))
         .select("source", F.explode(tri).alias("gram"))
         .distinct()
         .localCheckpoint())
    sizes = g.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    inter = (g.alias("a").join(
                 g.alias("b"),
                 (F.col("a.gram") == F.col("b.gram"))
                 & (F.col("a.source") < F.col("b.source")))
             .groupBy(F.col("a.source").alias("source_a"),
                      F.col("b.source").alias("source_b"))
             .agg(F.count(F.lit(1)).alias("n_common")))
    sa = sizes.select(F.col("source").alias("source_a"),
                      F.col("n_grams").alias("n_grams_a"))
    sb = sizes.select(F.col("source").alias("source_b"),
                      F.col("n_grams").alias("n_grams_b"))
    grid = (sa.crossJoin(sb)
            .filter(F.col("source_a") < F.col("source_b"))
            .join(inter, ["source_a", "source_b"], "left")
            .withColumn("n_common", F.coalesce(F.col("n_common"),
                                               F.lit(0))))
    jac = (F.col("n_common").cast("double")
           / (F.col("n_grams_a") + F.col("n_grams_b")
              - F.col("n_common")).cast("double"))
    cont = (F.col("n_common").cast("double")
            / F.least("n_grams_a", "n_grams_b").cast("double"))
    return (grid.select("source_a", "source_b",
                        F.col("n_grams_a").cast("long").alias("n_grams_a"),
                        F.col("n_grams_b").cast("long").alias("n_grams_b"),
                        F.col("n_common").cast("long").alias("n_common"),
                        jac.alias("jaccard"),
                        cont.alias("containment"))
            .orderBy("source_a", "source_b"))


ORACLE_SOURCE_SIMILARITY = """
WITH g AS (
  SELECT DISTINCT source, gram FROM (
    SELECT source,
           UNNEST([wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2]
                   FOR i IN range(1, len(wl) - 1)]) AS gram
    FROM (SELECT source, string_split(text, ' ') AS wl FROM documents)
  )
), sizes AS (
  SELECT source, COUNT(*) AS n_grams FROM g GROUP BY source
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_common
  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
  GROUP BY a.source, b.source
), grid AS (
  SELECT sa.source AS source_a, sb.source AS source_b,
         sa.n_grams AS n_grams_a, sb.n_grams AS n_grams_b,
         COALESCE(i.n_common, 0) AS n_common
  FROM sizes sa CROSS JOIN sizes sb
  LEFT JOIN inter i ON i.source_a = sa.source AND i.source_b = sb.source
  WHERE sa.source < sb.source
)
SELECT source_a, source_b,
       CAST(n_grams_a AS BIGINT) AS n_grams_a,
       CAST(n_grams_b AS BIGINT) AS n_grams_b,
       CAST(n_common AS BIGINT) AS n_common,
       CAST(n_common AS DOUBLE)
         / CAST(n_grams_a + n_grams_b - n_common AS DOUBLE) AS jaccard,
       CAST(n_common AS DOUBLE)
         / CAST(LEAST(n_grams_a, n_grams_b) AS DOUBLE) AS containment
FROM grid ORDER BY source_a, source_b
"""


# ---------------------------------------------------------------------------
# Unigram-LM commonness score per document (round 6)
# ---------------------------------------------------------------------------

def corpus_doc_commonness(spark: SparkSession, sf_dir: str,
                          rare_cut: int = 2) -> DataFrame:
    """Per-document unigram-LM commonness: the mean corpus-relative
    frequency of the document's tokens, plus the share of its tokens
    whose corpus frequency is ≤ ``rare_cut`` — the cheap LM-free proxy
    quality filters use to flag gibberish / rare-token-stuffed documents
    (low commonness, high rare ratio) before an expensive model pass.

    The mean of per-token probabilities ``avg(tf_i / total)`` is computed
    as ``sum(tf_i) / (n_tokens · total)`` — ONE integer-exact sum then
    ONE IEEE divide — because averaging per-token float quotients would
    make the result shuffle-order-dependent (and engine-dependent). No
    log for the same portability reason as the tfidf score.

    Scale shape: the token frequency table is vocabulary-sized, grouped
    with map-side partials; the join back to the exploded token stream
    broadcasts at real vocabularies (Catalyst/AQE picks broadcast under
    the threshold, falls back to a shuffle join over the corpus-sharded
    token stream beyond it — never driver-sized either way).
    """
    d = ld(spark, sf_dir, "documents")
    toks = d.select("doc_id",
                    F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    total = tf.agg(F.sum("tf").alias("total"))
    return (toks.join(tf, "tok")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum("tf").alias("tf_sum"),
                 F.sum((F.col("tf") <= rare_cut).cast("long"))
                 .alias("n_rare"))
            .join(F.broadcast(total))
            .select("doc_id", "n_tokens",
                    (F.col("tf_sum").cast("double")
                     / (F.col("n_tokens") * F.col("total")).cast("double"))
                    .alias("commonness"),
                    (F.col("n_rare").cast("double")
                     / F.col("n_tokens").cast("double"))
                    .alias("rare_ratio"))
            .orderBy("doc_id"))


ORACLE_DOC_COMMONNESS = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
tf AS (SELECT tok, COUNT(*) AS tf FROM toks GROUP BY tok),
total AS (SELECT SUM(tf) AS total FROM tf),
per_doc AS (
  SELECT t.doc_id, COUNT(*) AS n_tokens, SUM(f.tf) AS tf_sum,
         SUM(CASE WHEN f.tf <= 2 THEN 1 ELSE 0 END) AS n_rare
  FROM toks t JOIN tf f USING (tok) GROUP BY t.doc_id)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(tf_sum AS DOUBLE) / CAST(n_tokens * total AS DOUBLE)
         AS commonness,
       CAST(n_rare AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS rare_ratio
FROM per_doc, total ORDER BY doc_id
"""


def corpus_dsir_importance(spark: SparkSession, sf_dir: str,
                           target_source: str = "src0") -> DataFrame:
    """DSIR-style data-selection importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    score every document by how much more likely its hashed n-gram
    features are under a TARGET (in-domain) distribution than under the
    general corpus, then keep/resample the high-ratio tail. Here the
    target distribution is estimated from one source's documents
    (``target_source``) and the general distribution from every other
    source — the exact setup of "select web data that looks like my
    curated set".

    Portability: DSIR's score is a log-likelihood ratio Σ log(p_t/p_c);
    log is not exactly rounded, so cross-engine bitwise parity would be
    hostage to libm. This implementation ranks by the MONOTONE-equivalent
    ratio of per-document feature-mass sums: importance =
    ((Σ tf_target + 1) · (T_corpus + 1)) / ((Σ tf_corpus + 1) · (T_target
    + 1)) — two integer-exact sums per document, add-one smoothing, then
    ONE double multiply/divide chain (IEEE *,/ are exactly rounded, so
    DuckDB hash-matches bitwise). Features are word bigrams, the cheapest
    n-gram with usable domain signal.

    Scale shape: both frequency tables are vocabulary-sized with map-side
    partial aggregation; the join back onto the exploded bigram stream is
    AQE-broadcast at real vocabularies and degrades to a shuffled hash
    join beyond the threshold — never an all-pairs or driver-sized
    structure. Docs with <2 tokens have no bigram features and are
    excluded (no domain evidence either way).
    """
    d = ld(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y))
    bg = d.select("doc_id", "source", F.explode(bigrams).alias("bigram"))
    tf_t = (bg.filter(F.col("source") == target_source)
            .groupBy("bigram").agg(F.count(F.lit(1)).alias("tf_t")))
    tf_c = (bg.filter(F.col("source") != target_source)
            .groupBy("bigram").agg(F.count(F.lit(1)).alias("tf_c")))
    tot_t = tf_t.agg(F.sum("tf_t").alias("total_t"))
    tot_c = tf_c.agg(F.sum("tf_c").alias("total_c"))
    per_doc = (bg.join(tf_t, "bigram", "left")
               .join(tf_c, "bigram", "left")
               .groupBy("doc_id", "source")
               .agg(F.count(F.lit(1)).alias("n_bigrams"),
                    F.sum(F.coalesce("tf_t", F.lit(0))).alias("sum_t"),
                    F.sum(F.coalesce("tf_c", F.lit(0))).alias("sum_c")))
    imp = ((F.col("sum_t") + 1).cast("double")
           * (F.col("total_c") + 1).cast("double")
           / ((F.col("sum_c") + 1).cast("double")
              * (F.col("total_t") + 1).cast("double")))
    return (per_doc.join(F.broadcast(tot_t)).join(F.broadcast(tot_c))
            .select("doc_id", "source", "n_bigrams",
                    imp.alias("importance"),
                    (imp >= 1.0).alias("in_domain_leaning"))
            .orderBy("doc_id"))


ORACLE_DSIR_IMPORTANCE = """
WITH w AS (
  SELECT doc_id, source, string_split(text, ' ') AS wl FROM documents
), bg AS (
  SELECT doc_id, source, UNNEST([wl[i] || ' ' || wl[i+1]
                                 FOR i IN range(1, len(wl))]) AS bigram
  FROM w
), tf_t AS (
  SELECT bigram, COUNT(*) AS tf_t FROM bg WHERE source = 'src0'
  GROUP BY bigram
), tf_c AS (
  SELECT bigram, COUNT(*) AS tf_c FROM bg WHERE source <> 'src0'
  GROUP BY bigram
), tot_t AS (SELECT CAST(SUM(tf_t) AS BIGINT) AS total_t FROM tf_t),
tot_c AS (SELECT CAST(SUM(tf_c) AS BIGINT) AS total_c FROM tf_c),
per_doc AS (
  SELECT b.doc_id, b.source, COUNT(*) AS n_bigrams,
         CAST(SUM(COALESCE(t.tf_t, 0)) AS BIGINT) AS sum_t,
         CAST(SUM(COALESCE(c.tf_c, 0)) AS BIGINT) AS sum_c
  FROM bg b LEFT JOIN tf_t t USING (bigram)
            LEFT JOIN tf_c c USING (bigram)
  GROUP BY b.doc_id, b.source
)
SELECT doc_id, source, CAST(n_bigrams AS BIGINT) AS n_bigrams,
       CAST(sum_t + 1 AS DOUBLE) * CAST(total_c + 1 AS DOUBLE)
         / (CAST(sum_c + 1 AS DOUBLE) * CAST(total_t + 1 AS DOUBLE))
         AS importance,
       CAST(sum_t + 1 AS DOUBLE) * CAST(total_c + 1 AS DOUBLE)
         / (CAST(sum_c + 1 AS DOUBLE) * CAST(total_t + 1 AS DOUBLE))
         >= 1.0 AS in_domain_leaning
FROM per_doc, tot_t, tot_c ORDER BY doc_id
"""


def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the share of a document's distinct
    word bigrams whose FIRST occurrence in corpus order (min doc_id) is
    this document — the cheap duplication/diversity readout used to spot
    boilerplate-heavy tails (novelty → 0) and to estimate how much truly
    new text each ingest slice adds (the aggregate novelty curve is the
    classic diminishing-returns plot in every dataset paper).

    Exact and portable: "first occurrence" is ``min(doc_id)`` per gram —
    integer, total-ordered, engine-independent — and the ratio is one
    double division of exact integer counts. Scale shape: the gram →
    min(doc_id) table is vocabulary-sized (map-side partial MIN); the
    probe back onto the per-doc distinct gram stream is AQE-broadcast at
    real vocabularies. Nothing is pairwise, nothing is driver-sized.
    """
    d = ld(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    bigrams = F.array_distinct(F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, y: F.concat(x, F.lit(" "), y)))
    bg = d.select("doc_id", F.explode(bigrams).alias("bigram"))
    first = bg.groupBy("bigram").agg(F.min("doc_id").alias("first_doc"))
    return (bg.join(first, "bigram")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.sum((F.col("first_doc") == F.col("doc_id"))
                       .cast("long")).alias("n_novel"))
            .select("doc_id", "n_grams", "n_novel",
                    (F.col("n_novel").cast("double")
                     / F.col("n_grams").cast("double"))
                    .alias("novelty_ratio"))
            .orderBy("doc_id"))


ORACLE_NGRAM_NOVELTY = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS wl FROM documents
), bg AS (
  SELECT DISTINCT doc_id, bigram FROM (
    SELECT doc_id, UNNEST([wl[i] || ' ' || wl[i+1]
                           FOR i IN range(1, len(wl))]) AS bigram
    FROM w)
), first AS (
  SELECT bigram, MIN(doc_id) AS first_doc FROM bg GROUP BY bigram
)
SELECT b.doc_id, COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN f.first_doc = b.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = b.doc_id THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS novelty_ratio
FROM bg b JOIN first f USING (bigram)
GROUP BY b.doc_id ORDER BY b.doc_id
"""


def corpus_token_cooccurrence(spark: SparkSession, sf_dir: str,
                              vocab_k: int = 100, top_pairs: int = 50
                              ) -> DataFrame:
    """Document-level co-occurrence lift between the top-``vocab_k``
    tokens: for each token pair (a < b), in how many documents do both
    appear, and how does that compare to independence — the phrase /
    topic-coupling signal a corpus audit reads before n-gram merging or
    contamination triage (lift >> 1 = the pair travels together;
    ~1 = independent; << 1 = complementary distribution).

    Portability: lift keeps the log-free rational form
    ``(c_ab · N) / (df_a · df_b)`` — exact integer numerator and
    denominator, ONE IEEE divide (the PMI log is monotone in it, so
    rankings agree with textbook PMI). Vocabulary selection is
    deterministic: doc-frequency desc, then token asc.

    Scale shape: doc-frequency census (one shuffle, O(vocab) output) →
    TakeOrdered top-k vocab → BROADCAST semi-join pins the per-doc hit
    lists to ≤ vocab_k entries → per-doc pair explosion is ≤
    C(vocab_k, 2) bounded, grouped map-side-partial → marginals join is
    a broadcast of vocab_k rows. The corpus-sized token stream is
    touched exactly once; nothing all-pairs ever forms.
    """
    d = ld(spark, sf_dir, "documents")
    n_docs = d.count()  # bounded scalar (allowed class)
    hits = (d.select("doc_id",
                     F.explode(F.array_distinct(F.split("text", " ")))
                     .alias("term")))
    df_tbl = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    vocab = df_tbl.orderBy(F.desc("df"), "term").limit(vocab_k)
    vhits = hits.join(F.broadcast(vocab), "term")
    pairs = (vhits.alias("a")
             .join(vhits.alias("b"), on=[
                 F.col("a.doc_id") == F.col("b.doc_id"),
                 F.col("a.term") < F.col("b.term")])
             .groupBy(F.col("a.term").alias("t1"),
                      F.col("b.term").alias("t2"))
             .agg(F.count(F.lit(1)).alias("c_ab"),
                  F.max(F.col("a.df")).alias("df_a"),
                  F.max(F.col("b.df")).alias("df_b")))
    return (pairs.select(
        "t1", "t2", "c_ab", "df_a", "df_b",
        ((F.col("c_ab") * F.lit(n_docs)).cast("double")
         / (F.col("df_a") * F.col("df_b"))).alias("lift"))
        .orderBy(F.desc("c_ab"), "t1", "t2")
        .limit(top_pairs))


ORACLE_TOKEN_COOCCURRENCE = """
WITH hits AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
    FROM documents)),
df_tbl AS (
  SELECT term, COUNT(*) AS df FROM hits GROUP BY term),
vocab AS (
  SELECT term, df FROM df_tbl ORDER BY df DESC, term LIMIT 100),
vhits AS (
  SELECT h.doc_id, h.term, v.df FROM hits h JOIN vocab v USING (term)),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
pairs AS (
  SELECT a.term AS t1, b.term AS t2, COUNT(*) AS c_ab,
         MAX(a.df) AS df_a, MAX(b.df) AS df_b
  FROM vhits a JOIN vhits b
    ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term)
SELECT t1, t2, c_ab, df_a, df_b,
       CAST(c_ab * n_docs AS DOUBLE) / (df_a * df_b) AS lift
FROM pairs, n
ORDER BY c_ab DESC, t1, t2 LIMIT 50
"""


def corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps'-law) curve: streaming the corpus in
    doc_id order, how many distinct token types have been seen after
    each tenth of the documents — the readout that sizes tokenizer
    vocabularies and predicts how much NEW vocabulary another 10× of
    crawl will bring (V(N) ≈ K·N^β; a flattening new_types column says
    the source is vocabulary-exhausted, a linear one says keep crawling).

    Exact, not sampled: each token type's FIRST-appearance document
    ordinal m (ordinals via :func:`~.scale.global_ranks` on doc_id — no
    single-partition window; the helper's localCheckpoint pin lets the
    doc census and the token scan share one ranking) maps to the first
    decile where the type is visible, d = ceil(10·m/n) computed as
    exact-integer (10·m+n−1) div n, because decile d's prefix holds the
    first (n·d) div 10 docs. One O(corpus-tokens) explode feeding an
    O(vocabulary) min-aggregation with map-side partials, two 10-row
    cumulative windows (driver-bounded by construction), all-integer
    output — no float protocol needed.
    """
    from .scale import global_ranks

    d = ld(spark, sf_dir, "documents").select("doc_id", "text")
    ranked, n = global_ranks(d, [F.asc("doc_id")], num_partitions=8)
    dd = F.expr(f"(10 * global_rn + {n}L - 1) div {n}L")
    docs10 = (ranked
              .select(dd.alias("decile"),
                      F.size(F.split("text", " ")).alias("ntok"))
              .groupBy("decile")
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum("ntok").alias("n_tokens")))
    first = (ranked
             .select("global_rn",
                     F.explode(F.split("text", " ")).alias("token"))
             .groupBy("token")
             .agg(F.min("global_rn").alias("m"))
             .select(F.expr(f"(10 * m + {n}L - 1) div {n}L")
                     .alias("decile"))
             .groupBy("decile")
             .agg(F.count(F.lit(1)).alias("new_types")))
    wcum = (Window.orderBy("decile")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (docs10.join(first, "decile", "left")
            .select("decile", "n_docs", "n_tokens",
                    F.coalesce("new_types", F.lit(0)).alias("new_types"))
            .withColumn("cum_docs", F.sum("n_docs").over(wcum))
            .withColumn("cum_tokens", F.sum("n_tokens").over(wcum))
            .withColumn("cum_vocab", F.sum("new_types").over(wcum))
            .select("decile", "new_types", "cum_docs", "cum_tokens",
                    "cum_vocab")
            .orderBy("decile"))


ORACLE_HEAPS_LAW = """
WITH ranked AS (
  SELECT doc_id, text,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS i,
         COUNT(*) OVER () AS n
  FROM documents),
docs10 AS (
  SELECT (10 * i + n - 1) // n AS decile,
         COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM ranked GROUP BY decile),
first AS (
  SELECT (10 * m + n - 1) // n AS decile, COUNT(*) AS new_types
  FROM (SELECT MIN(i) AS m, ANY_VALUE(n) AS n
        FROM (SELECT i, n, UNNEST(string_split(text, ' ')) AS token
              FROM ranked)
        GROUP BY token)
  GROUP BY decile)
SELECT d.decile,
       COALESCE(f.new_types, 0) AS new_types,
       CAST(SUM(d.n_docs) OVER w AS BIGINT) AS cum_docs,
       CAST(SUM(d.n_tokens) OVER w AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(f.new_types, 0)) OVER w AS BIGINT) AS cum_vocab
FROM docs10 d LEFT JOIN first f USING (decile)
WINDOW w AS (ORDER BY d.decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
ORDER BY d.decile
"""


def corpus_distinctive_terms(spark: SparkSession, sf_dir: str,
                             top_n: int = 3, min_df: int = 5
                             ) -> DataFrame:
    """The terms that CHARACTERIZE each source — highest odds ratio of
    in-source vs out-of-source document frequency — the log-free twin of
    log-odds/keyness analysis and the per-source complement of
    corpus_dsir_importance (which scores docs, not terms). Used to name
    mixture components and spot contaminated sources (a crawl slice
    whose distinctive terms are boilerplate is a dedup target).

    Add-one (integer!) Haldane-style smoothing keeps the ratio finite
    and exact: OR = (a+1)(B−b+1) / ((A−a+1)(b+1)) with a = in-source df,
    b = out-source df, A/B = in/out doc counts — all exact bigint
    products, ONE IEEE divide (the module's rational-over-log protocol:
    ln differs by ulps across engines, integer products do not).
    Ranking is per-source (OR DESC, token) — a source-PARTITIONed
    window, never global. Shape: one explode → distinct (doc, token) →
    (source, token) census bounded by sources × vocabulary; doc totals
    broadcast; min_df floors out noise terms.
    """
    d = ld(spark, sf_dir, "documents")
    doc_tok = (d.select("doc_id", "source",
                        F.explode(F.split("text", " ")).alias("token"))
               .dropDuplicates(["doc_id", "token"]))
    # (source × vocab)-bounded; pinned — the token-df rollup and the
    # main join both consume it
    st = (doc_tok.groupBy("source", "token")
          .agg(F.count(F.lit(1)).alias("a"))
          .localCheckpoint())
    df_tot = (st.groupBy("token")
              .agg(F.sum("a").alias("df")))
    src_tot = d.groupBy("source").agg(F.count(F.lit(1)).alias("a_docs"))
    n_tot = d.agg(F.count(F.lit(1)).alias("n_docs"))
    j = (st.join(F.broadcast(df_tot), "token")
         .join(F.broadcast(src_tot), "source")
         .join(F.broadcast(n_tot))
         .filter(F.col("df") >= min_df))
    b = F.col("df") - F.col("a")
    big_b = F.col("n_docs") - F.col("a_docs")
    odds = (((F.col("a") + 1) * (big_b - b + 1)).cast("double")
            / ((F.col("a_docs") - F.col("a") + 1) * (b + 1))
            .cast("double"))
    # top-n per source WITHOUT a source-keyed window (rewritten round 7):
    # the census is (sources × vocab)-sized and a ~8-value source window
    # would sort each source's whole vocabulary slice in one task —
    # grouped_ranks range-shuffles instead and the ordinal join key
    # scales out
    from .scale import grouped_ranks

    sel = j.select("source", "token", "a", F.col("df").alias("df_total"),
                   odds.alias("odds_ratio"))
    return (grouped_ranks(sel, ["source"],
                          [F.desc("odds_ratio"), F.asc("token")],
                          rank_col="rank")
            .filter(F.col("rank") <= top_n)
            .orderBy("source", "rank"))


ORACLE_DISTINCTIVE_TERMS = """
WITH doc_tok AS (
  SELECT DISTINCT doc_id, source, token
  FROM (SELECT doc_id, source,
               UNNEST(string_split(text, ' ')) AS token
        FROM documents)),
st AS (
  SELECT source, token, COUNT(*) AS a FROM doc_tok GROUP BY source, token),
df_tot AS (SELECT token, CAST(SUM(a) AS BIGINT) AS df FROM st GROUP BY token),
src_tot AS (SELECT source, COUNT(*) AS a_docs FROM documents GROUP BY source),
n_tot AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT st.source, st.token, st.a, df_tot.df AS df_total,
         CAST((st.a + 1) * ((n_tot.n_docs - src_tot.a_docs)
                            - (df_tot.df - st.a) + 1) AS DOUBLE)
         / CAST((src_tot.a_docs - st.a + 1)
                * (df_tot.df - st.a + 1) AS DOUBLE) AS odds_ratio
  FROM st JOIN df_tot USING (token)
       JOIN src_tot USING (source)
       CROSS JOIN n_tot
  WHERE df_tot.df >= 5)
SELECT source, token, a, df_total, odds_ratio,
       CAST(rank AS INT) AS rank
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY odds_ratio DESC, token) AS rank
      FROM scored)
WHERE rank <= 3
ORDER BY source, rank
"""
