"""Text analysis operators over the ``documents`` table: token counting,
quality scoring, language-ID heuristic, and document fingerprinting.

All pure Catalyst expressions (no Python in the row path): string splits,
array HOFs, integer arithmetic. Ratios are exact integer divisions promoted
to double, so oracle comparisons are bitwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import ld, ld_docs, ld_py

# Tiny per-language stopword lists for the n-gram/stopword language heuristic.
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "y", "es"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "est", "un"],
}

_PUNCT_CHARS = ".,;:!?"

# GPT-2-style pre-tokenizer (contractions, letter runs, digit runs, other
# symbols, whitespace runs — each with an optional leading space). Restricted
# to constructs Java regex and DuckDB's RE2 interpret identically, so the
# count is oracle-checkable.
BPE_PRETOKEN_RE = (
    "'s|'t|'re|'ve|'m|'ll|'d"
    "| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"
)


def text_token_stats(spark, sf_dir):
    """Whitespace token counts + BPE-ish token counts + char stats."""
    d = ld(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_tokens = F.size(words)
    n_chars = F.length("text")
    # BPE-ish proxy: ~1 token per 4 chars, at least one per word
    bpe_estimate = F.greatest(
        n_tokens, F.ceil(n_chars.cast("double") / 4).cast("int"))
    return d.select(
        "doc_id", "lang",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.size(F.array_distinct(words)).alias("n_unique_tokens"),
        bpe_estimate.alias("bpe_token_estimate"),
        F.regexp_count("text", F.lit(BPE_PRETOKEN_RE)).alias("n_bpe_tokens"),
        ((n_chars - n_tokens + 1).cast("double") / n_tokens)
        .alias("avg_word_len"),
    )


# The regex contains single quotes ('s|'t|…) — escape them ''-style before
# splicing into the single-quoted SQL literal, or DuckDB's parser dies at 's
# (round-1 regression: the unescaped f-string broke the oracle).
_BPE_RE_SQL = BPE_PRETOKEN_RE.replace("'", "''")

ORACLE_TEXT_TOKENS = f"""
SELECT doc_id, lang,
       len(string_split(text, ' ')) AS n_tokens,
       LENGTH(text) AS n_chars,
       len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
       GREATEST(len(string_split(text, ' ')),
                CAST(CEIL(LENGTH(text)::DOUBLE / 4) AS INTEGER)) AS bpe_token_estimate,
       len(regexp_extract_all(text,
           '{_BPE_RE_SQL}')) AS n_bpe_tokens,
       (LENGTH(text) - len(string_split(text, ' ')) + 1)::DOUBLE
         / len(string_split(text, ' ')) AS avg_word_len
FROM documents
"""


def quality_score_expr(text_col: str = "text",
                       n_chars_col: str = "n_chars") -> F.Column:
    """Composite 0-100 quality heuristic (length band, type-token ratio,
    stopword presence, punctuation density) as a reusable expression —
    shared by ``text_quality_score`` and the curation report so both
    registries score documents identically."""
    words = F.split(F.col(text_col), " ")
    n_tokens = F.size(words).cast("double")
    ttr = F.size(F.array_distinct(words)).cast("double") / n_tokens
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(words),
        F.array(*[F.lit(w) for w in LANG_MARKERS["en"]])))
    punct = (F.length(text_col)
             - F.length(F.translate(text_col, _PUNCT_CHARS, ""))
             ).cast("double")
    # empty text: punct density is undefined (0/0 is ANSI-fatal) — NULL,
    # which the <= 0.1 band treats as not-met (poisoned-values contract)
    punct_ratio = punct / F.nullif(F.length(text_col), F.lit(0))
    length_ok = (F.col(n_chars_col) >= 100) & (F.col(n_chars_col) <= 5000)
    return (F.when(length_ok, 40).otherwise(10)
            + ttr * 30
            + F.when(stop_hits > 0, 20).otherwise(0)
            + F.when(punct_ratio <= 0.1, 10).otherwise(0))


def text_quality_score(spark, sf_dir):
    """Quality heuristics: length band, type-token ratio, stopword ratio,
    punctuation density → composite 0-100 score (all exact arithmetic)."""
    d = ld(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_tokens = F.size(words).cast("double")
    ttr = F.size(F.array_distinct(words)).cast("double") / n_tokens
    punct = (F.length("text")
             - F.length(F.translate("text", _PUNCT_CHARS, ""))).cast("double")
    # NULL for empty text, not an ANSI 0/0 abort (poisoned contract)
    punct_ratio = punct / F.nullif(F.length("text"), F.lit(0))
    return d.select("doc_id", ttr.alias("type_token_ratio"),
                    punct_ratio.alias("punct_ratio"),
                    quality_score_expr().alias("quality_score"))


ORACLE_TEXT_QUALITY = """
WITH t AS (
  SELECT doc_id, text, n_chars, string_split(text, ' ') AS w FROM documents
)
SELECT doc_id,
       len(list_distinct(w))::DOUBLE / len(w) AS type_token_ratio,
       (LENGTH(text) - LENGTH(replace(replace(replace(replace(replace(replace(text,
           '.', ''), ',', ''), ';', ''), ':', ''), '!', ''), '?', '')))::DOUBLE
         / LENGTH(text) AS punct_ratio,
       (CASE WHEN n_chars >= 100 AND n_chars <= 5000 THEN 40 ELSE 10 END)
       + (len(list_distinct(w))::DOUBLE / len(w)) * 30
       + (CASE WHEN len(list_intersect(list_distinct(w),
                  ['the','a','of','and','is'])) > 0 THEN 20 ELSE 0 END)
       + (CASE WHEN (LENGTH(text) - LENGTH(replace(replace(replace(replace(replace(replace(text,
           '.', ''), ',', ''), ';', ''), ':', ''), '!', ''), '?', '')))::DOUBLE
           / LENGTH(text) <= 0.1 THEN 10 ELSE 0 END) AS quality_score
FROM t
"""


def predicted_lang_expr(text_col: str = "text") -> F.Column:
    """Stopword-hit language prediction with the fixed en→es→de→fr
    tie-break, as a reusable expression — shared by ``text_langid``, its
    eval twin, and the curation report."""
    words = F.array_distinct(F.split(F.col(text_col), " "))
    hits = {
        lang: F.size(F.array_intersect(
            words, F.array(*[F.lit(w) for w in markers])))
        for lang, markers in LANG_MARKERS.items()
    }
    return (
        F.when((hits["en"] >= hits["es"]) & (hits["en"] >= hits["de"])
               & (hits["en"] >= hits["fr"]) & (hits["en"] > 0), "en")
        .when((hits["es"] >= hits["de"]) & (hits["es"] >= hits["fr"])
              & (hits["es"] > 0), "es")
        .when((hits["de"] >= hits["fr"]) & (hits["de"] > 0), "de")
        .when(hits["fr"] > 0, "fr")
        .otherwise("und"))


def text_langid(spark, sf_dir):
    """Stopword-hit language heuristic with a fixed tie-break order, compared
    against the labeled ``lang`` column → per-language accuracy counts."""
    d = ld(spark, sf_dir, "documents")
    return (d.select("lang", predicted_lang_expr().alias("predicted_lang"))
            .groupBy("lang", "predicted_lang")
            .agg(F.count(F.lit(1)).alias("n")))


ORACLE_TEXT_LANGID = """
WITH h AS (
  SELECT lang,
         len(list_intersect(list_distinct(string_split(text,' ')),
             ['the','a','of','and','is'])) AS en_h,
         len(list_intersect(list_distinct(string_split(text,' ')),
             ['el','la','de','y','es'])) AS es_h,
         len(list_intersect(list_distinct(string_split(text,' ')),
             ['der','die','das','und','ist'])) AS de_h,
         len(list_intersect(list_distinct(string_split(text,' ')),
             ['le','la','et','est','un'])) AS fr_h
  FROM documents
)
SELECT lang,
       CASE WHEN en_h >= es_h AND en_h >= de_h AND en_h >= fr_h AND en_h > 0 THEN 'en'
            WHEN es_h >= de_h AND es_h >= fr_h AND es_h > 0 THEN 'es'
            WHEN de_h >= fr_h AND de_h > 0 THEN 'de'
            WHEN fr_h > 0 THEN 'fr'
            ELSE 'und' END AS predicted_lang,
       COUNT(*) AS n
FROM h GROUP BY 1, 2
"""


def text_normalize(spark, sf_dir):
    """Training-data cleaning pass: lowercase, strip punctuation, collapse
    whitespace runs, trim — all JVM string expressions, scan-speed at any
    scale. Emits a stable prefix so the oracle row stays small."""
    d = ld(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(
        F.translate(F.lower("text"), _PUNCT_CHARS, ""), " +", " "))
    return d.select(
        "doc_id",
        F.substring(norm, 1, 80).alias("norm_prefix"),
        F.length(norm).alias("norm_len"),
        (F.length("text") - F.length(norm)).alias("chars_removed"))


ORACLE_TEXT_NORMALIZE = """
WITH n AS (
  SELECT doc_id, text,
         TRIM(regexp_replace(
             translate(LOWER(text), '.,;:!?', ''), ' +', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id,
       norm[1:80] AS norm_prefix,
       LENGTH(norm) AS norm_len,
       LENGTH(text) - LENGTH(norm) AS chars_removed
FROM n
"""


def text_fingerprint(spark, sf_dir):
    """Deterministic rolling polynomial hash (mod large prime) per document —
    a content fingerprint computable incrementally at ingest. Sequential
    left-fold over characters keeps it engine-portable bit-for-bit."""
    # NULL text has no characters to fingerprint — ld_docs'
    # corrupted-shard contract (r11 nulldoc gate), mirrored in the
    # oracle
    d = ld_docs(spark, sf_dir).filter(F.col("doc_id") < 200)
    fp = F.expr(
        "aggregate(transform(sequence(1, length(text)),"
        " i -> ascii(substr(text, i, 1))),"
        " 0L, (acc, c) -> (acc * 31 + c) % 1000000007)")
    return d.select("doc_id", fp.alias("fingerprint"))


ORACLE_TEXT_FINGERPRINT = """
SELECT doc_id,
       list_reduce(
         list_prepend(0::BIGINT,
                      [ascii(text[i])::BIGINT FOR i IN range(1, length(text)+1)]),
         (acc, c) -> (acc * 31 + c) % 1000000007) AS fingerprint
FROM documents WHERE doc_id < 200 AND text IS NOT NULL
"""


# union of every language's marker words — the Gopher-style "contains a
# common function word" rule must fire for non-English fixture docs too
_ALL_MARKERS = sorted({w for ws in LANG_MARKERS.values() for w in ws})


def text_gopher_filters(spark, sf_dir):
    """Gopher-style quality-filter rule battery (per-rule flags + final
    keep decision) — the document-level gate a pretraining pipeline runs
    before tokenization. Rules adapted to the fixture corpus:

    - word count inside [10, 5000];
    - mean word length inside [2, 12];
    - at least one common function word (union of the language marker
      lists — multilingual corpora must not auto-fail the stopword rule);
    - symbol ratio ≤ 0.1 (non-alphanumeric, non-space characters).

    Pure Catalyst: splits, translates, integer arithmetic; ratios are
    single exact divisions so every flag is oracle-portable. One scan, no
    shuffle — at 100 TB this runs at read speed and the keep flag drives
    a pushed-down filter in the downstream pipeline.

    Loaded via ``ld_py``: per-row work (translate + array_intersect) with
    NO downstream exchange means a single-row-group fixture would run the
    whole battery on one core — measured 0.75 s → 0.43 s fanned at sf0.1.
    (``text_repetition_metrics`` keeps ``ld``: its explode feeds a keyed
    partial agg, the pattern where the fan-out measured slower.)
    """
    d = ld_py(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    mwl = (F.length("text") - n_words + 1).cast("double") / n_words
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(words),
        F.array(*[F.lit(w) for w in _ALL_MARKERS])))
    # strip a-z, A-Z, 0-9 and spaces; what's left is "symbols"
    stripped = F.translate(
        F.lower("text"), "abcdefghijklmnopqrstuvwxyz0123456789 ", "")
    # an EMPTY document divides 0/0 under ANSI — symbol ratio is
    # undefined there (the words_ok gate already rejects it): NULL,
    # not a job abort; all-true on fixture data
    sym_ratio = F.when(F.length("text") > 0,
                       F.length(stripped).cast("double")
                       / F.length("text"))
    words_ok = (n_words >= 10) & (n_words <= 5000)
    mwl_ok = (mwl >= 2.0) & (mwl <= 12.0)
    stop_ok = stop_hits > 0
    sym_ok = sym_ratio <= 0.1
    return d.select(
        "doc_id", n_words.alias("n_words"), mwl.alias("mean_word_len"),
        stop_hits.alias("stopword_hits"), sym_ratio.alias("symbol_ratio"),
        words_ok.alias("words_ok"), mwl_ok.alias("mwl_ok"),
        stop_ok.alias("stop_ok"), sym_ok.alias("sym_ok"),
        (words_ok & mwl_ok & stop_ok & sym_ok).alias("keep"))


_MARKERS_SQL = ", ".join(f"'{w}'" for w in _ALL_MARKERS)

ORACLE_TEXT_GOPHER = f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS w,
         LENGTH(translate(LOWER(text),
                'abcdefghijklmnopqrstuvwxyz0123456789 ', ''))::DOUBLE
           / LENGTH(text) AS sym_ratio,
         (LENGTH(text) - len(string_split(text, ' ')) + 1)::DOUBLE
           / len(string_split(text, ' ')) AS mwl,
         len(list_intersect(list_distinct(string_split(text, ' ')),
             [{_MARKERS_SQL}])) AS stop_hits
  FROM documents
)
SELECT doc_id, len(w) AS n_words, mwl AS mean_word_len,
       stop_hits AS stopword_hits, sym_ratio AS symbol_ratio,
       len(w) BETWEEN 10 AND 5000 AS words_ok,
       mwl BETWEEN 2.0 AND 12.0 AS mwl_ok,
       stop_hits > 0 AS stop_ok,
       sym_ratio <= 0.1 AS sym_ok,
       (len(w) BETWEEN 10 AND 5000) AND (mwl BETWEEN 2.0 AND 12.0)
         AND stop_hits > 0 AND sym_ratio <= 0.1 AS keep
FROM t
"""


def text_repetition_metrics(spark, sf_dir):
    """Repetition-based quality signals: the share of a document taken by
    its single most frequent word and most frequent word bigram (boiler-
    plate and degenerate generations score high). A doc is flagged when
    the top unigram exceeds 20% of tokens or the top bigram exceeds 10%.

    Plan: explode → two (doc, gram) count aggregations → per-doc max.
    Both aggregations partition by doc_id, so the exchanges line up; all
    counts are exact integers and the shares single divisions (portable).
    """
    d = ld(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    base = d.select("doc_id", words.alias("w"),
                    F.size(words).alias("n_words"))
    uni = (base.select("doc_id", "n_words", F.explode("w").alias("g"))
           .groupBy("doc_id", "n_words", "g")
           .agg(F.count(F.lit(1)).alias("c"))
           .groupBy("doc_id", "n_words")
           .agg(F.max("c").alias("top_uni")))
    bigrams = F.expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1),"
        " (x, y) -> concat(x, ' ', y))")
    bi = (base.select("doc_id", "n_words",
                      F.explode(bigrams).alias("g"))
          .groupBy("doc_id", "n_words", "g")
          .agg(F.count(F.lit(1)).alias("c"))
          .groupBy("doc_id", "n_words")
          .agg(F.max("c").alias("top_bi")))
    uni_share = F.col("top_uni").cast("double") / F.col("n_words")
    bi_share = F.col("top_bi").cast("double") / (F.col("n_words") - 1)
    return (uni.join(bi, ["doc_id", "n_words"])
            .select("doc_id", "n_words",
                    uni_share.alias("top_unigram_share"),
                    bi_share.alias("top_bigram_share"),
                    ((uni_share > 0.2) | (bi_share > 0.1))
                    .alias("repetitive"))
            .orderBy("doc_id"))


ORACLE_TEXT_REPETITION = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), uni AS (
  SELECT doc_id, len(w) AS n_words, MAX(c) AS top_uni FROM (
    SELECT doc_id, w, g, COUNT(*) AS c
    FROM (SELECT doc_id, w, unnest(w) AS g FROM t)
    GROUP BY doc_id, w, g)
  GROUP BY doc_id, len(w)
), bi AS (
  SELECT doc_id, MAX(c) AS top_bi FROM (
    SELECT doc_id, g, COUNT(*) AS c
    FROM (SELECT doc_id,
                 unnest([w[i] || ' ' || w[i+1] FOR i IN range(1, len(w))])
                   AS g
          FROM t)
    GROUP BY doc_id, g)
  GROUP BY doc_id
)
SELECT uni.doc_id, n_words,
       top_uni::DOUBLE / n_words AS top_unigram_share,
       top_bi::DOUBLE / (n_words - 1) AS top_bigram_share,
       (top_uni::DOUBLE / n_words > 0.2)
         OR (top_bi::DOUBLE / (n_words - 1) > 0.1) AS repetitive
FROM uni JOIN bi ON uni.doc_id = bi.doc_id
ORDER BY uni.doc_id
"""


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction battery: regex-scrub emails and phone
    numbers from free text, emitting the redacted string and per-kind
    match counts (the scrub pass every LLM training corpus runs).

    The fixture corpus is synthetic word salad with no embedded PII, so
    the contact strings are CONSTRUCTED deterministically from customer
    columns (identical scalar expressions on both engines) and then
    scrubbed — the operator under test is the regex battery itself:
    ``regexp_replace`` (global) + match counting, patterns restricted to
    syntax Java regex and RE2 interpret identically (char classes,
    bounded repetition — no backrefs, no lookaround).

    Plan: pure per-row Catalyst expressions (whole-stage codegen, no
    Python) over one scan; trivially scan-parallel at 100 TB.
    """
    email_re = r"[a-z0-9.]+@[a-z0-9.-]+\.example\.com"
    phone_re = r"555-[0-9]{4}"
    c = ld(spark, sf_dir, "customer", fanout=False)
    handle = F.lower(F.regexp_replace("c_name", r"[^A-Za-z0-9]", ""))
    msg = F.concat(
        F.lit("user "), F.col("c_name"),
        F.lit(" wrote: reach me at "), handle,
        F.lit("@"), F.lower(F.trim("c_mktsegment")),
        F.lit(".example.com or 555-"),
        F.lpad((F.col("c_custkey") % 10000).cast("string"), 4, "0"),
        F.lit(" during office hours"))
    return (c.select(F.col("c_custkey"), msg.alias("msg"))
            .select(
                "c_custkey",
                F.size(F.regexp_extract_all("msg", F.lit(email_re), 0))
                .alias("n_emails"),
                F.size(F.regexp_extract_all("msg", F.lit(phone_re), 0))
                .alias("n_phones"),
                F.regexp_replace(
                    F.regexp_replace("msg", email_re, "[EMAIL]"),
                    phone_re, "[PHONE]").alias("redacted"))
            .orderBy("c_custkey"))


ORACLE_TEXT_PII = r"""
WITH m AS (
  SELECT c_custkey,
         'user ' || c_name || ' wrote: reach me at '
           || LOWER(regexp_replace(c_name, '[^A-Za-z0-9]', '', 'g'))
           || '@' || LOWER(TRIM(c_mktsegment))
           || '.example.com or 555-'
           || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
           || ' during office hours' AS msg
  FROM customer
)
SELECT c_custkey,
       len(regexp_extract_all(msg, '[a-z0-9.]+@[a-z0-9.-]+\.example\.com'))
         AS n_emails,
       len(regexp_extract_all(msg, '555-[0-9]{4}')) AS n_phones,
       regexp_replace(
         regexp_replace(msg, '[a-z0-9.]+@[a-z0-9.-]+\.example\.com',
                        '[EMAIL]', 'g'),
         '555-[0-9]{4}', '[PHONE]', 'g') AS redacted
FROM m
ORDER BY c_custkey
"""


def text_langid_eval(spark, sf_dir) -> "DataFrame":
    """Classifier evaluation metrics on Spark: per-language precision,
    recall, and F1 for the language-ID heuristic against the labeled
    ``lang`` column — the model-eval aggregation an ML data pipeline runs
    after every labeling pass. F1 uses the integer-exact formulation
    ``2·tp / (2·tp + fp + fn)`` (one division on identically-derived
    operands — no p·r/(p+r) float composition).

    Built FROM the confusion counts (text_langid): tp on the diagonal,
    fp summed down the predicted column, fn along the actual row — three
    tiny aggregations over the ≤25-cell matrix.
    """
    conf = text_langid(spark, sf_dir)
    tp = (conf.filter(F.col("lang") == F.col("predicted_lang"))
          .select(F.col("lang").alias("language"),
                  F.col("n").alias("tp")))
    fp = (conf.filter(F.col("lang") != F.col("predicted_lang"))
          .groupBy(F.col("predicted_lang").alias("language"))
          .agg(F.sum("n").alias("fp")))
    fn = (conf.filter(F.col("lang") != F.col("predicted_lang"))
          .groupBy(F.col("lang").alias("language"))
          .agg(F.sum("n").alias("fn")))
    j = (tp.join(fp, "language", "full_outer")
         .join(fn, "language", "full_outer")
         .select("language",
                 F.coalesce("tp", F.lit(0)).alias("tp"),
                 F.coalesce("fp", F.lit(0)).alias("fp"),
                 F.coalesce("fn", F.lit(0)).alias("fn")))
    return (j.select(
        "language", "tp", "fp", "fn",
        F.try_divide(F.col("tp").cast("double"),
                     (F.col("tp") + F.col("fp")).cast("double"))
        .alias("precision"),
        F.try_divide(F.col("tp").cast("double"),
                     (F.col("tp") + F.col("fn")).cast("double"))
        .alias("recall"),
        F.try_divide((2 * F.col("tp")).cast("double"),
                     (2 * F.col("tp") + F.col("fp")
                      + F.col("fn")).cast("double")).alias("f1"))
        .orderBy("language"))


ORACLE_TEXT_LANGID_EVAL = """
WITH h AS (
  SELECT lang,
         len(list_intersect(list_distinct(string_split(text,' ')),
             ['the','a','of','and','is'])) AS en_h,
         len(list_intersect(list_distinct(string_split(text,' ')),
             ['el','la','de','y','es'])) AS es_h,
         len(list_intersect(list_distinct(string_split(text,' ')),
             ['der','die','das','und','ist'])) AS de_h,
         len(list_intersect(list_distinct(string_split(text,' ')),
             ['le','la','et','est','un'])) AS fr_h
  FROM documents
), conf AS (
  SELECT lang,
         CASE WHEN en_h >= es_h AND en_h >= de_h AND en_h >= fr_h AND en_h > 0 THEN 'en'
              WHEN es_h >= de_h AND es_h >= fr_h AND es_h > 0 THEN 'es'
              WHEN de_h >= fr_h AND de_h > 0 THEN 'de'
              WHEN fr_h > 0 THEN 'fr'
              ELSE 'und' END AS predicted_lang,
         COUNT(*) AS n
  FROM h GROUP BY 1, 2
), tp AS (
  SELECT lang AS language, n AS tp FROM conf WHERE lang = predicted_lang
), fp AS (
  SELECT predicted_lang AS language, SUM(n) AS fp FROM conf
  WHERE lang <> predicted_lang GROUP BY predicted_lang
), fn AS (
  SELECT lang AS language, SUM(n) AS fn FROM conf
  WHERE lang <> predicted_lang GROUP BY lang
), j AS (
  SELECT COALESCE(tp.language, fp.language, fn.language) AS language,
         COALESCE(tp.tp, 0) AS tp,
         CAST(COALESCE(fp.fp, 0) AS BIGINT) AS fp,
         CAST(COALESCE(fn.fn, 0) AS BIGINT) AS fn
  FROM tp FULL OUTER JOIN fp ON tp.language = fp.language
  FULL OUTER JOIN fn ON COALESCE(tp.language, fp.language) = fn.language
)
SELECT language, tp, fp, fn,
       CAST(tp AS DOUBLE) / NULLIF(CAST(tp + fp AS DOUBLE), 0)
         AS precision,
       CAST(tp AS DOUBLE) / NULLIF(CAST(tp + fn AS DOUBLE), 0) AS recall,
       CAST(2 * tp AS DOUBLE) / NULLIF(CAST(2 * tp + fp + fn AS DOUBLE), 0)
         AS f1
FROM j
ORDER BY language
"""


# ---------------------------------------------------------------------------
# Feature-hashed linear quality classifier (fastText-style scale shape)
# ---------------------------------------------------------------------------

#: Feature-hash width. 64 buckets keeps the fixture's weight table readable;
#: a production classifier uses 2^20+ buckets — the plan shape (broadcast
#: weight dim + one hash agg) is identical at any width.
HASH_BUCKETS = 64

#: Knuth multiplicative constant: deterministic pseudo-random weights per
#: bucket, identical in any engine with 64-bit integer arithmetic.
_WEIGHT_MIX = 2654435761


def _token_bucket(tok) -> F.Column:
    """Cross-engine feature hash: (37·len + 17·first_cp + last_cp) mod 64.

    Uses only length/ascii/substring so DuckDB computes bit-identical
    buckets (verified on the zh/es/de/fr fixture text — Spark's ``ascii``
    and DuckDB's both return the Unicode code point of the first char).
    A production pipeline would swap in ``xxhash64(tok) % width``
    Spark-side — kept arithmetic here so the oracle can replay it.
    """
    c = F.col(tok) if isinstance(tok, str) else tok
    return (37 * F.length(c)
            + 17 * F.ascii(F.substring(c, 1, 1))
            + F.ascii(F.substring(c, -1, 1))) % HASH_BUCKETS


def hashed_weight_table(spark: SparkSession) -> DataFrame:
    """The model: one integer milli-weight per hash bucket, generated from
    the bucket id by a Knuth multiplicative mix (wt ∈ [-1000, 1000]).
    Integer weights BY DESIGN: per-doc scores sum exactly long-side and
    divide once at the end, so float addition order — which differs
    between Spark partial aggregation and DuckDB's scan order — never
    touches the result (the determinism protocol, relational.py).

    In production this frame is the trained model loaded from storage;
    either way it is O(buckets) rows and broadcast, never shuffled.
    """
    return spark.range(HASH_BUCKETS).select(
        F.col("id").alias("bucket"),
        ((F.col("id") * _WEIGHT_MIX) % 2001 - 1000).alias("wt_milli"))


def _hashed_linear_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id, lang, n_tokens, sum_wt_milli, quality_score for every doc.

    Plan: explode tokens (narrow) → broadcast-hash-join the 64-row weight
    dim (no shuffle) → one hash aggregate keyed by doc_id. All explode
    output for a doc stays in its scan partition, so map-side partial
    aggregation collapses to one row per doc before the exchange — the
    shuffle is O(documents), not O(tokens). This is the fastText-style
    scorer shape that survives 100 TB: no Python in the row path, one
    integer-weighted sum per doc.
    """
    d = ld(spark, sf_dir, "documents")
    toks = (d.select("doc_id", "lang",
                     F.explode(F.split("text", " ")).alias("tok"))
            .filter(F.col("tok") != ""))
    w = hashed_weight_table(spark)
    scored = (toks.withColumn("bucket", _token_bucket("tok"))
              .join(F.broadcast(w), "bucket")
              .groupBy("doc_id", "lang")
              .agg(F.count(F.lit(1)).alias("n_tokens"),
                   F.sum("wt_milli").alias("sum_wt_milli")))
    score = (F.col("sum_wt_milli").cast("double")
             / (F.col("n_tokens") * 1000).cast("double"))
    return scored.withColumn("quality_score", score)


def classifier_quality_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality score from a feature-hashed linear model — the
    Spark half of the fastText-style quality classifier every corpus
    curation pipeline runs before mixing (token → hash bucket →
    broadcast weight lookup → mean weight per doc → threshold gate).

    The score is the exact rational mean of integer milli-weights
    (ONE double division per doc), so the oracle hash-matches bitwise.
    """
    s = _hashed_linear_scored(spark, sf_dir)
    return (s.select("doc_id", "n_tokens",
                     F.col("sum_wt_milli").cast("long").alias("sum_wt_milli"),
                     "quality_score",
                     (F.col("quality_score") > 0.0).alias("passes"))
            .orderBy("doc_id"))


ORACLE_CLASSIFIER_QUALITY = """
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents
  ) WHERE tok <> ''
), weights AS (
  SELECT range AS bucket, (range * 2654435761) % 2001 - 1000 AS wt_milli
  FROM range(64)
), scored AS (
  SELECT doc_id, COUNT(*) AS n_tokens, SUM(wt_milli) AS sum_wt_milli
  FROM toks JOIN weights
    ON (37 * length(tok) + 17 * ascii(substr(tok, 1, 1))
        + ascii(substr(tok, length(tok), 1))) % 64 = bucket
  GROUP BY doc_id
)
SELECT doc_id, n_tokens, CAST(sum_wt_milli AS BIGINT) AS sum_wt_milli,
       CAST(sum_wt_milli AS DOUBLE) / CAST(n_tokens * 1000 AS DOUBLE)
         AS quality_score,
       CAST(sum_wt_milli AS DOUBLE) / CAST(n_tokens * 1000 AS DOUBLE) > 0.0
         AS passes
FROM scored
ORDER BY doc_id
"""


def classifier_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile gains/lift table for the hashed linear score against a gold
    label (``lang = 'en'``) — the calibration readout that decides
    whether a quality classifier is worth gating a 100 TB mixture on
    (top-decile lift ≫ 1 → the score concentrates the target class).

    Scale shape: scoring reuses the broadcast-join aggregate above;
    decile assignment rides ``scale.global_ranks`` + ``ntile_expr``
    (range shuffle, NO single-partition window — the exact ANSI NTILE
    semantics are reproduced arithmetically from the gap-free rank, so
    the oracle's ``NTILE(10) OVER (ORDER BY ...)`` matches row-for-row).
    The cumulative pass runs on the 10-row decile frame via a tiny
    triangular self-join — nothing global touches full data.

    Lift arithmetic: cumulative response over deciles 1..d divided by the
    base rate, evaluated as (cum_pos/cum_docs) / (tot_pos/total) — two
    exact integer divisions then one double division, pinned in the same
    order in the oracle (bitwise-portable; avoids the cross-product
    overflow a single-fraction form would hit at 10^12 docs).
    """
    from .scale import global_ranks, ntile_expr

    s = _hashed_linear_scored(spark, sf_dir).withColumn(
        "is_pos", (F.col("lang") == "en").cast("long"))
    order = [F.desc("quality_score"), F.asc("doc_id")]
    ranked, n = global_ranks(s, order, num_partitions=8)
    per = (ranked.select(ntile_expr(F.col("global_rn"), n, 10)
                         .alias("decile"), "is_pos")
           .groupBy("decile")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("is_pos").alias("n_pos")))
    a, b = per.alias("a"), per.alias("b")
    cum = (a.join(b, F.col("b.decile") <= F.col("a.decile"))
           .groupBy("a.decile", "a.n_docs", "a.n_pos")
           .agg(F.sum("b.n_docs").alias("cum_docs"),
                F.sum("b.n_pos").alias("cum_pos")))
    tot = per.agg(F.sum("n_docs").alias("total"),
                  F.sum("n_pos").alias("tot_pos"))
    # a corpus with zero positives makes lift undefined (base rate
    # 0): NULL, not an ANSI divide error; all-true on fixture data
    lift = F.when(
        F.col("tot_pos") > 0,
        (F.col("cum_pos").cast("double") / F.col("cum_docs"))
        / (F.col("tot_pos").cast("double") / F.col("total")))
    return (cum.crossJoin(F.broadcast(tot))
            .select(F.col("decile").cast("int").alias("decile"),
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.col("n_pos").cast("long").alias("n_pos"),
                    (F.col("n_pos").cast("double") / F.col("n_docs"))
                    .alias("response_rate"),
                    F.col("cum_docs").cast("long").alias("cum_docs"),
                    F.col("cum_pos").cast("long").alias("cum_pos"),
                    lift.alias("cum_lift"))
            .orderBy("decile"))


ORACLE_CLASSIFIER_GAINS = """
WITH toks AS (
  SELECT doc_id, lang, tok FROM (
    SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS tok
    FROM documents
  ) WHERE tok <> ''
), weights AS (
  SELECT range AS bucket, (range * 2654435761) % 2001 - 1000 AS wt_milli
  FROM range(64)
), scored AS (
  SELECT doc_id, lang, COUNT(*) AS n_tokens,
         SUM(wt_milli) AS sum_wt_milli
  FROM toks JOIN weights
    ON (37 * length(tok) + 17 * ascii(substr(tok, 1, 1))
        + ascii(substr(tok, length(tok), 1))) % 64 = bucket
  GROUP BY doc_id, lang
), ranked AS (
  SELECT doc_id, lang,
         CAST(sum_wt_milli AS DOUBLE) / CAST(n_tokens * 1000 AS DOUBLE)
           AS quality_score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_pos
  FROM scored
), tiled AS (
  SELECT is_pos,
         NTILE(10) OVER (ORDER BY quality_score DESC, doc_id) AS decile
  FROM ranked
), per AS (
  SELECT decile, COUNT(*) AS n_docs, SUM(is_pos) AS n_pos
  FROM tiled GROUP BY decile
), cum AS (
  SELECT a.decile, a.n_docs, a.n_pos,
         SUM(b.n_docs) AS cum_docs, SUM(b.n_pos) AS cum_pos
  FROM per a JOIN per b ON b.decile <= a.decile
  GROUP BY a.decile, a.n_docs, a.n_pos
), tot AS (
  SELECT SUM(n_docs) AS total, SUM(n_pos) AS tot_pos FROM per
)
SELECT CAST(decile AS INT) AS decile,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_pos AS DOUBLE) / n_docs AS response_rate,
       CAST(cum_docs AS BIGINT) AS cum_docs,
       CAST(cum_pos AS BIGINT) AS cum_pos,
       (CAST(cum_pos AS DOUBLE) / cum_docs)
         / (CAST(tot_pos AS DOUBLE) / total) AS cum_lift
FROM cum, tot
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# Readability / lexical-complexity battery (round 6)
# ---------------------------------------------------------------------------

def text_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document lexical-complexity profile: token count, average word
    length, vowel-group syllable proxy per word, long-word (≥ 6 chars)
    ratio, and a Flesch-Kincaid-style grade index
    ``0.39·avg_word_len + 11.8·syllables_per_word`` — the cheap
    curation-time readability signal corpus filters sort on.

    Pure single-scan codegen: every metric derives from ``split`` /
    ``regexp_count`` / ``length`` on the text column — no shuffle except
    the final order, no UDF. Ratios are integer-over-integer IEEE
    divides and the grade index multiplies by exactly-representable-
    parse decimal literals in the same op order as the oracle →
    bitwise-portable (the tfidf rational-arithmetic protocol; no log,
    whose last-ulp Spark/DuckDB disagreement is measured).
    """
    d = ld(spark, sf_dir, "documents", fanout=False)
    toks = F.size(F.split("text", " "))
    syls = F.regexp_count("text", F.lit("[aeiou]+"))
    # chars in words = total chars − separators (tokens − 1 spaces)
    word_chars = F.length("text") - (toks - F.lit(1))
    long_words = F.size(F.filter(F.split("text", " "),
                                 lambda t: F.length(t) >= 6))
    avg_wl = word_chars.cast("double") / toks.cast("double")
    spw = syls.cast("double") / toks.cast("double")
    return (d.select(
        "doc_id",
        toks.alias("n_tokens"),
        avg_wl.alias("avg_word_len"),
        spw.alias("syllables_per_word"),
        (long_words.cast("double") / toks.cast("double"))
        .alias("long_word_ratio"),
        (F.lit(0.39) * avg_wl + F.lit(11.8) * spw).alias("grade_index"))
        .orderBy("doc_id"))


ORACLE_TEXT_READABILITY = """
WITH m AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         len(regexp_extract_all(text, '[aeiou]+')) AS syls,
         length(text) - (len(string_split(text, ' ')) - 1) AS word_chars,
         len(list_filter(string_split(text, ' '),
                         t -> length(t) >= 6)) AS long_words
  FROM documents)
SELECT doc_id,
       CAST(n_tokens AS INT) AS n_tokens,
       CAST(word_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         AS avg_word_len,
       CAST(syls AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         AS syllables_per_word,
       CAST(long_words AS DOUBLE) / CAST(n_tokens AS DOUBLE)
         AS long_word_ratio,
       0.39 * (CAST(word_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE))
         + 11.8 * (CAST(syls AS DOUBLE) / CAST(n_tokens AS DOUBLE))
         AS grade_index
FROM m ORDER BY doc_id
"""
