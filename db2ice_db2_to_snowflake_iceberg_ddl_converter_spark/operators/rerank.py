"""Two-stage retrieval: ANN shortlist → cross-encoder-style rerank.

The production retrieval pattern for LLM data pipelines and RAG serving:
a cheap vector recall stage (ANN over embeddings — ``similarity.py``)
proposes ``shortlist_k`` candidates per query, then an expensive PAIRWISE
scorer that sees both texts jointly re-orders the shortlist and keeps the
top ``k``. The reference engine has no retrieval surface at all; this
module serves the training-data-pipeline brief alongside similarity.py.

Scale shape (the part that matters at 100 TB): the rerank stage only ever
touches ``n_queries × shortlist_k`` pairs — never the corpus. Candidate
texts are fetched with two hash-join probes of the documents table keyed
by id (the shortlist side is broadcast — it is KB-sized by construction),
and the pairwise scoring runs as ONE Arrow-batched ``mapInPandas`` pass
over those pairs, so a pluggable neural cross-encoder amortizes model
load per executor and scores whole Arrow batches at a time.

The scorer seam follows the multimodal codec pattern
(``multimodal.py:132-141``): the DEFAULT scorer is a real, deterministic
lexical cross-scorer (distinct-token-overlap F1 — computable here and
oracle-checkable in SQL), and ``transformer_cross_encoder_factory`` is the
honest stub that raises ImportError with the install hint in this
container but returns a real model-backed scorer unchanged on a cluster
that ships sentence-transformers.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd  # module-top: scorer signatures must resolve at def time
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def lexical_overlap_scorer(q_texts: pd.Series,
                           c_texts: pd.Series) -> pd.Series:
    """Default pairwise scorer: F1 over DISTINCT single-space tokens,
    ``2·|A∩B| / (|A|+|B|)``.

    Deliberately mirrors DuckDB's ``list_intersect(list_distinct(
    string_split(x, ' ')), ...)`` term for term — split on the literal
    single space (NOT whitespace runs), empties kept — and computes the
    one double division on exact integer operands, so the oracle
    hash-matches bitwise. A real cross-encoder replaces this via the
    ``scorer=`` seam; the plumbing is identical.
    """
    def f1(q: str, c: str) -> float:
        a, b = set(q.split(" ")), set(c.split(" "))
        if not a or not b:
            return 0.0
        return 2.0 * len(a & b) / (len(a) + len(b))

    return pd.Series([f1(q, c) for q, c in zip(q_texts, c_texts)],
                     dtype="float64")


def transformer_cross_encoder_factory(
        model_name: str = "cross-encoder/ms-marco-MiniLM-L-6-v2"):
    """Factory for a sentence-transformers CrossEncoder scorer shaped like
    ``lexical_overlap_scorer`` (two text Series in, one float64 Series
    out), so it plugs straight into ``rerank_pairs(scorer=...)``.

    Gated behind an import-try: this container ships no
    sentence-transformers, so the factory raising ImportError (with the
    install hint) IS the designed behavior here — the pytest asserts
    exactly that, and asserts the seam works by injecting a fake. On a
    cluster with the package the same call returns a real model-backed
    scorer with zero code changes; the model loads ONCE per factory call
    (i.e. once per executor when built inside the mapInPandas closure).
    """
    try:
        from sentence_transformers import CrossEncoder  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - env-dependent branch
        raise ImportError(
            "sentence-transformers is not installed in this environment; "
            "pip install sentence-transformers to use a neural "
            "cross-encoder, or keep the default lexical_overlap_scorer"
        ) from exc

    model = CrossEncoder(model_name)  # pragma: no cover - needs package

    def score(q_texts: pd.Series, c_texts: pd.Series) -> pd.Series:
        preds = model.predict(list(zip(q_texts, c_texts)))
        return pd.Series(preds, dtype="float64")

    return score  # pragma: no cover


def rerank_pairs(pairs: DataFrame,
                 scorer: Callable[[pd.Series, pd.Series], pd.Series]
                 | None = None,
                 q_col: str = "q_text", c_col: str = "c_text",
                 score_col: str = "rerank_score") -> DataFrame:
    """The Arrow plumbing: score (query text, candidate text) pairs in
    batches with ``mapInPandas``, appending ``score_col`` (double).

    One Python stage, whole-batch calls into the scorer (BLAS / model
    inference amortizes), all other columns pass through untouched. The
    default scorer is the oracle-checkable lexical F1.
    """
    scorer = scorer or lexical_overlap_scorer
    out_schema = T.StructType(
        list(pairs.schema.fields)
        + [T.StructField(score_col, T.DoubleType())])

    def score_batches(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[score_col] = scorer(pdf[q_col], pdf[c_col])
            yield pdf

    return pairs.mapInPandas(score_batches, schema=out_schema)


def rerank_ann_shortlist(spark: SparkSession, sf_dir: str, k: int = 5,
                         n_queries: int = 10, shortlist_k: int = 20,
                         scorer=None) -> DataFrame:
    """Registry entry: the full two-stage pipeline over the fixture
    corpus. Stage 1 = exact-cosine shortlist of ``shortlist_k``
    candidates per query vector (``similarity.ann_brute_force_topk`` —
    swap in the LSH/IVF/PQ stage at scale, same contract); stage 2 =
    pairwise rerank of those candidates' TEXTS, keep top ``k``.

    Output carries both ranks so the stage-2 lift is visible:
    ``ann_rank`` (vector recall order) vs ``rerank_rank`` (pairwise
    order). Ties break on neighbor_id in both stages.

    Oracle coupling: the defaults (k=5, n_queries=10, shortlist_k=20)
    are baked into the oracle as constants (same trap as
    scale_zorder_zvalues) — non-default values are ad-hoc only, with no
    parity claim; a non-default ``scorer`` additionally has no oracle by
    construction.
    """
    from .relational import ld_docs
    from .similarity import ann_brute_force_topk

    shortlist = (ann_brute_force_topk(spark, sf_dir, k=shortlist_k,
                                      n_queries=n_queries)
                 .select("query_id", "neighbor_id",
                         F.col("nn_rank").alias("ann_rank")))
    # NULL-text docs cannot be pairwise-scored (ld_docs' corrupted-
    # shard contract; a NULL reaching the scorer UDF crashed the r11
    # nulldoc gate) — they drop out of stage 2 on BOTH join sides and
    # the top-k fills from scoreable candidates, mirrored in the oracle.
    docs = ld_docs(spark, sf_dir).select("doc_id", "text")
    pairs = (F.broadcast(shortlist)
             .join(docs.select(F.col("doc_id").alias("query_id"),
                               F.col("text").alias("q_text")), "query_id")
             .join(docs.select(F.col("doc_id").alias("neighbor_id"),
                               F.col("text").alias("c_text")),
                   "neighbor_id"))
    scored = rerank_pairs(pairs, scorer=scorer)
    w = Window.partitionBy("query_id").orderBy(F.desc("rerank_score"),
                                               "neighbor_id")
    return (scored.withColumn("rerank_rank", F.row_number().over(w))
            .filter(F.col("rerank_rank") <= k)
            .select("query_id", "neighbor_id", "ann_rank",
                    "rerank_score", F.col("rerank_rank").cast("int")
                    .alias("rerank_rank"))
            .orderBy("query_id", "rerank_rank"))


ORACLE_RERANK_ANN = """
WITH shortlist AS (
  SELECT query_id, neighbor_id, nn_rank AS ann_rank FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY a.vec_id
             ORDER BY list_cosine_similarity(a.embedding::DOUBLE[],
                                             b.embedding::DOUBLE[]) DESC,
                      b.vec_id) AS nn_rank
    FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    WHERE a.vec_id < 10
      AND a.embedding IS NOT NULL AND len(list_filter(a.embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)) = 0
      AND list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]) > 0
      AND b.embedding IS NOT NULL AND len(list_filter(b.embedding, x -> x IS NULL OR isnan(x) OR abs(x) > 1e6)) = 0
      AND list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0)
  WHERE nn_rank <= 20
), pairs AS (
  SELECT s.query_id, s.neighbor_id, s.ann_rank,
         list_distinct(string_split(dq.text, ' ')) AS q_toks,
         list_distinct(string_split(dc.text, ' ')) AS c_toks
  FROM shortlist s
  JOIN documents dq ON s.query_id = dq.doc_id AND dq.text IS NOT NULL
  JOIN documents dc ON s.neighbor_id = dc.doc_id AND dc.text IS NOT NULL
), scored AS (
  SELECT query_id, neighbor_id, ann_rank,
         2.0 * len(list_intersect(q_toks, c_toks))
             / (len(q_toks) + len(c_toks)) AS rerank_score
  FROM pairs
), ranked AS (
  SELECT query_id, neighbor_id, ann_rank, rerank_score,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY rerank_score DESC, neighbor_id) AS INT) AS rerank_rank
  FROM scored
)
SELECT query_id, neighbor_id, ann_rank, rerank_score, rerank_rank
FROM ranked WHERE rerank_rank <= 5
ORDER BY query_id, rerank_rank
"""
