"""Tests for the feature-hashed linear quality classifier, its decile
gains/lift calibration, and the per-source KS length-drift check. The
oracle parity sweep pins cross-engine equality; these tests pin what
parity can't see: agreement with independent pure-Python references,
ANSI NTILE balance, lift identities, and plan shape (broadcast weight
join, no Python in the row path, no single-partition window)."""

import bisect

import pytest

from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
    corpus,
    textstats,
)
from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
    assert_no_python_in_plan,
)


def _ref_score(text):
    """Pure-Python twin of the hashed linear scorer."""
    toks = [t for t in text.split(" ") if t]
    s = 0
    for t in toks:
        b = (37 * len(t) + 17 * ord(t[0]) + ord(t[-1])) % 64
        s += (b * 2654435761) % 2001 - 1000
    return len(toks), s


class TestClassifierQualityLinear:
    def test_matches_pure_python(self, spark, sf_dir):
        docs = {r.doc_id: r.text for r in spark.read.parquet(
            f"{sf_dir}/documents.parquet").select("doc_id", "text").collect()}
        rows = textstats.classifier_quality_linear(spark, sf_dir).collect()
        assert len(rows) == len(docs)
        for r in rows:
            n, s = _ref_score(docs[r.doc_id])
            assert (r.n_tokens, r.sum_wt_milli) == (n, s)
            assert r.quality_score == s / (n * 1000)
            assert r.passes == (r.quality_score > 0.0)

    def test_plan_broadcasts_weights_no_python(self, spark, sf_dir):
        df = textstats.classifier_quality_linear(spark, sf_dir)
        assert_no_python_in_plan(df)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, \
            "64-row weight dim must broadcast"
        assert "SortMergeJoin" not in plan, \
            "weight lookup must never shuffle the token stream"


class TestClassifierGainsDeciles:
    def test_ntile_balance_and_lift_identities(self, spark, sf_dir):
        rows = textstats.classifier_gains_deciles(spark, sf_dir).collect()
        assert [r.decile for r in rows] == list(range(1, 11))
        sizes = [r.n_docs for r in rows]
        assert max(sizes) - min(sizes) <= 1          # ANSI NTILE balance
        total = sum(sizes)
        tot_pos = sum(r.n_pos for r in rows)
        cum_d = cum_p = 0
        for r in rows:
            cum_d += r.n_docs
            cum_p += r.n_pos
            assert (r.cum_docs, r.cum_pos) == (cum_d, cum_p)
            assert r.response_rate == r.n_pos / r.n_docs
            assert r.cum_lift == (cum_p / cum_d) / (tot_pos / total)
        assert rows[-1].cum_lift == 1.0              # full-corpus lift ≡ 1

    def test_deciles_follow_score_order(self, spark, sf_dir):
        """Decile 1 must hold the top-scored docs: recompute the exact
        per-decile positive counts from the pure-Python scores."""
        d = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("doc_id", "text", "lang").collect()
        scored = sorted(
            ((-s / (n * 1000), r.doc_id, r.lang == "en")
             for r in d for n, s in [_ref_score(r.text)]))
        n = len(scored)
        base, rem = divmod(n, 10)
        expected, i = [], 0
        for dec in range(10):
            size = base + (1 if dec < rem else 0)
            expected.append(sum(1 for _, _, p in scored[i:i + size] if p))
            i += size
        rows = textstats.classifier_gains_deciles(spark, sf_dir).collect()
        assert [r.n_pos for r in rows] == expected


def _ref_ks(src_vals, rest_vals):
    src, rest = sorted(src_vals), sorted(rest_vals)
    best, best_x = 0.0, None
    for x in sorted(set(src) | set(rest)):
        fs = bisect.bisect_right(src, x) / len(src)
        fr = bisect.bisect_right(rest, x) / len(rest)
        d = abs(fs - fr)
        if d > best:
            best, best_x = d, x
    return best, best_x


class TestCorpusSourceKsDrift:
    def test_matches_pure_python_ks(self, spark, sf_dir):
        lens = [(r.source, r.n_chars) for r in spark.read.parquet(
            f"{sf_dir}/documents.parquet").select("source",
                                                  "n_chars").collect()]
        rows = corpus.corpus_source_ks_drift(spark, sf_dir).collect()
        assert len(rows) == len({s for s, _ in lens})
        for r in rows:
            src = [x for s, x in lens if s == r.source]
            rest = [x for s, x in lens if s != r.source]
            ks, _ = _ref_ks(src, rest)
            assert r.n_src == len(src)
            assert r.ks_stat == pytest.approx(ks, abs=1e-12)
            assert 0.0 <= r.ks_stat <= 1.0
            # ks_at is the smallest length attaining the max, so the ref
            # first-crossing point matches exactly
            assert r.ks_at == _ref_ks(src, rest)[1]

    def test_no_python_no_global_window(self, spark, sf_dir):
        df = corpus.corpus_source_ks_drift(spark, sf_dir)
        assert_no_python_in_plan(df)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # every Window in the plan is partitioned by source — nothing
        # funnels the compacted frame through one task
        for frag in plan.split("Window ")[1:]:
            head = frag.split("\n", 1)[0]
            assert "source" in head, f"unpartitioned window: {head}"


class TestSplitLeakageSafe:
    def test_cluster_split_invariants(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            traindata,
        )

        per_doc = traindata._leakage_safe_assignments(spark,
                                                      sf_dir).collect()
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert len(per_doc) == n_docs
        # the defining invariant: one split per cluster — no near-dup pair
        # can straddle train/test
        by_cluster = {}
        for r in per_doc:
            by_cluster.setdefault(r.cluster_id, set()).add(r.split)
        assert all(len(s) == 1 for s in by_cluster.values())
        # the representative keeps its own naive split (it IS the rep)
        for r in per_doc:
            if r.doc_id == r.cluster_id:
                assert r.naive_split == r.split
        # summary ties out against the per-doc frame
        rows = traindata.split_leakage_safe(spark, sf_dir).collect()
        assert sum(r.n_docs for r in rows) == n_docs
        for r in rows:
            docs = [d for d in per_doc if d.split == r.split]
            assert r.n_docs == len(docs)
            assert r.n_clusters == len({d.cluster_id for d in docs})
            assert r.n_docs_moved == sum(
                1 for d in docs if d.naive_split != d.split)


class TestCorpusSourceSimilarity:
    def test_matches_pure_python(self, spark, sf_dir):
        rows = spark.read.parquet(f"{sf_dir}/documents.parquet") \
            .select("source", "text").collect()
        grams = {}
        for r in rows:
            w = r.text.split(" ")
            grams.setdefault(r.source, set()).update(
                " ".join(w[i:i + 3]) for i in range(len(w) - 2))
        out = corpus.corpus_source_similarity(spark, sf_dir).collect()
        srcs = sorted(grams)
        assert len(out) == len(srcs) * (len(srcs) - 1) // 2
        for r in out:
            a, b = grams[r.source_a], grams[r.source_b]
            inter = len(a & b)
            assert r.source_a < r.source_b
            assert (r.n_grams_a, r.n_grams_b, r.n_common) == \
                (len(a), len(b), inter)
            assert r.jaccard == inter / (len(a) + len(b) - inter)
            assert r.containment == inter / min(len(a), len(b))

    def test_native_trigrams_no_python(self, spark, sf_dir):
        df = corpus.corpus_source_similarity(spark, sf_dir)
        assert_no_python_in_plan(df)


class TestEmbeddingPcaProject:
    def test_matches_full_batch_numpy(self, spark, sf_dir):
        import numpy as np

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            similarity,
        )

        rows = spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
            .select("vec_id", "embedding").collect()
        ids = np.array([r.vec_id for r in rows])
        x = np.array([r.embedding for r in rows], dtype=np.float64)
        order = np.argsort(ids)
        ids, x = ids[order], x[order]
        mu = x.mean(0)
        cov = np.cov(x, rowvar=False, bias=True)
        evals, evecs = np.linalg.eigh(cov)
        idx = np.argsort(evals)[::-1][:4]
        comps = evecs[:, idx].T.copy()
        for i in range(4):                     # same sign convention
            j = int(np.argmax(np.abs(comps[i])))
            if comps[i, j] < 0:
                comps[i] = -comps[i]
        expected = (x - mu) @ comps.T

        out = similarity.embedding_pca_project(spark, sf_dir).collect()
        assert [r.vec_id for r in out] == ids.tolist()
        got = np.array([[r.pc1, r.pc2, r.pc3, r.pc4] for r in out])
        # partial-sum reassociation → tiny float slack vs full-batch
        assert np.allclose(got, expected, atol=1e-8)

        # distributed components are orthonormal and explain the same
        # variance ratios as the full-batch decomposition
        e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        dcomps, dexpl, dmean = similarity.pca_components(e, k=4)
        assert np.allclose(dcomps @ dcomps.T, np.eye(4), atol=1e-9)
        assert np.allclose(dmean, mu, atol=1e-9)
        assert np.allclose(dexpl, evals[idx] / np.trace(cov), atol=1e-9)
        # variance captured decreases down the component list
        assert all(dexpl[i] >= dexpl[i + 1] - 1e-12 for i in range(3))


class TestCheckpointPlanPins:
    """The compacted-frame localCheckpoint pins (KS drift, source
    similarity, gains deciles): every downstream reference must read the
    materialized compaction, never re-derive it — the final plan then
    contains ZERO parquet scans (pre-fix: 42 scans in the KS plan)."""

    def _scan_count(self, df):
        p = df._jdf.queryExecution().executedPlan().toString()
        return p.count("FileScan") + p.count("Scan parquet")

    def test_ks_drift_single_corpus_pass(self, spark, sf_dir):
        assert self._scan_count(
            corpus.corpus_source_ks_drift(spark, sf_dir)) == 0

    def test_source_similarity_single_corpus_pass(self, spark, sf_dir):
        assert self._scan_count(
            corpus.corpus_source_similarity(spark, sf_dir)) == 0

    def test_gains_deciles_single_corpus_pass(self, spark, sf_dir):
        assert self._scan_count(
            textstats.classifier_gains_deciles(spark, sf_dir)) == 0
