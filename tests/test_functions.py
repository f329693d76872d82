"""Function-library tests: expression builders agree with the operator
implementations, and SQL registration makes the Python-backed functions
callable from spark.sql."""

from pyspark.sql import functions as F

from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark import functions as fx
from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import ld


def test_text_expressions_match_textstats_operator(spark, sf_dir):
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.textstats import (
        text_token_stats,
    )

    d = ld(spark, sf_dir, "documents")
    lib = d.select(
        "doc_id",
        fx.token_count("text").alias("n_tokens"),
        fx.bpe_token_estimate("text").alias("bpe_token_estimate"),
    ).orderBy("doc_id").collect()
    op = text_token_stats(spark, sf_dir).orderBy("doc_id").collect()
    assert [(r.n_tokens, r.bpe_token_estimate) for r in lib] == \
        [(r.n_tokens, r.bpe_token_estimate) for r in op]


def test_rolling_fingerprint_matches_python(spark, sf_dir):
    d = ld(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    rows = d.select("doc_id", "text",
                    fx.rolling_fingerprint("text").alias("fp")).collect()
    for r in rows:
        acc = 0
        for ch in r.text:
            acc = (acc * 31 + ord(ch)) % 1_000_000_007
        assert r.fp == acc, r.doc_id


def test_vector_reexports_are_the_operator_functions(spark):
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import similarity

    assert fx.cosine_expr is similarity.cosine_expr
    assert fx.dot_expr is similarity.dot_expr


def test_sql_registration_and_calls(spark, sf_dir):
    names = fx.register_sql_functions(spark)
    assert names == ["engine_shingles", "engine_jaccard", "engine_feature_norm"]
    ld(spark, sf_dir, "documents").limit(50).createOrReplaceTempView("t_docs")
    row = spark.sql("""
        SELECT engine_jaccard(engine_shingles(text), engine_shingles(text)) AS self_j,
               size(engine_shingles(text)) AS n_sh
        FROM t_docs WHERE doc_id = 0
    """).first()
    assert row.self_j == 1.0
    assert row.n_sh > 0
    # distinct docs: jaccard in [0, 1)
    pair = spark.sql("""
        SELECT engine_jaccard(a.sh, b.sh) AS j
        FROM (SELECT engine_shingles(text) sh FROM t_docs WHERE doc_id = 0) a,
             (SELECT engine_shingles(text) sh FROM t_docs WHERE doc_id = 1) b
    """).first()
    assert 0.0 <= pair.j <= 1.0


def test_feature_norm_sql_matches_multimodal(spark, sf_dir):
    from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.multimodal import (
        multimodal_features,
    )

    fx.register_sql_functions(spark)
    ld(spark, sf_dir, "documents").limit(20).createOrReplaceTempView("t_docs2")
    via_sql = {r.doc_id: r.n for r in spark.sql(
        "SELECT doc_id, engine_feature_norm(encode(text, 'utf-8')) AS n "
        "FROM t_docs2").collect()}
    via_op = {r.doc_id: r.feature_norm
              for r in multimodal_features(spark, sf_dir).collect()
              if r.doc_id in via_sql}
    for k, v in via_sql.items():
        assert abs(v - via_op[k]) < 1e-9


class TestBpeTrainMerges:
    @staticmethod
    def _ref_bpe(vocab, n_merges):
        """Independent pure-Python BPE trainer: adjacent-overlapping pair
        stats weighted by token frequency, ties on (left, right), greedy
        left-to-right non-overlapping merge — the textbook algorithm."""
        merges = []
        for step in range(1, n_merges + 1):
            stats = {}
            for syms, f in vocab.items():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    stats[p] = stats.get(p, 0) + f
            if not stats:
                break
            (a, b), w = min(stats.items(),
                            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            merges.append((step, a, b, a + b, w))
            new = {}
            for syms, f in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == a
                            and syms[i + 1] == b):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                key = tuple(out)
                new[key] = new.get(key, 0) + f
            vocab = new
        return merges

    def test_merge_sequence_matches_reference(self, spark, sf_dir):
        from collections import Counter

        import duckdb

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            corpus,
        )

        got = [tuple(r) for r in
               corpus.bpe_train_merges(spark, sf_dir, n_merges=8).collect()]

        toks = Counter()
        for (text,) in duckdb.sql(
                f"SELECT text FROM '{sf_dir}/documents.parquet'").fetchall():
            toks.update(t for t in text.split(" ") if t)
        vocab = {tuple(t): f for t, f in toks.items()}
        want = self._ref_bpe(vocab, 8)
        assert got == want

    def test_merged_symbols_feed_later_rounds(self, spark, sf_dir):
        """The trainer is genuinely iterative: with enough rounds some
        merge must consume a previously-merged multi-char symbol."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            corpus,
        )

        rows = corpus.bpe_train_merges(spark, sf_dir, n_merges=12).collect()
        assert len(rows) == 12
        assert any(len(r["left"]) > 1 or len(r["right"]) > 1 for r in rows)


class TestBpeEncodeStats:
    @staticmethod
    def _ref_encode(tok: str, merges) -> int:
        """Independent pure-Python BPE encoder: apply each trained rule
        in order, greedy left-to-right non-overlapping."""
        syms = list(tok)
        for _, a, b, _m, _w in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return len(syms)

    def test_doc_rollup_matches_reference_encoder(self, spark, sf_dir):
        from collections import Counter

        import duckdb

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            corpus,
        )

        merges = [tuple(r) for r in
                  corpus.bpe_train_merges(spark, sf_dir, n_merges=8)
                  .collect()]
        got = {r["doc_id"]: (r["n_tokens"], r["n_symbols"], r["n_chars"])
               for r in corpus.bpe_encode_stats(spark, sf_dir, n_merges=8)
               .collect()}

        docs = duckdb.sql(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
        # encode each distinct token once, like the operator does
        vocab = Counter(t for _, text in docs for t in text.split(" ") if t)
        enc = {t: self._ref_encode(t, merges) for t in vocab}
        want = {}
        for doc_id, text in docs:
            toks = [t for t in text.split(" ") if t]
            want[doc_id] = (len(toks), sum(enc[t] for t in toks),
                            sum(len(t) for t in toks))
        assert got == want

    def test_encoding_actually_compresses(self, spark, sf_dir):
        """With trained merges, symbols per doc must drop strictly below
        character count somewhere (the rules fired) and never below the
        token count (each token is >= 1 symbol)."""
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            corpus,
        )

        rows = corpus.bpe_encode_stats(spark, sf_dir, n_merges=8).collect()
        assert all(r["n_tokens"] <= r["n_symbols"] <= r["n_chars"]
                   for r in rows)
        assert any(r["n_symbols"] < r["n_chars"] for r in rows)


class TestBpeMultiFold:
    """The r12 combined fold (``_bpe_merge_fold_multi``) must reproduce
    sequential single-rule folds exactly — one Catalyst pass per safe
    batch instead of one stacked fold per rule."""

    @staticmethod
    def _seq_merge(syms, rules):
        """Pure-Python sequential greedy left-to-right non-overlapping
        application of each rule in order (the reference semantics the
        trainer pytests pin)."""
        for a, b in rules:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    def test_fold_groups_split_on_left_collision(self):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.corpus import (
            _bpe_fold_groups,
        )

        # rule 2's merged string "xy" equals rule 1's left: a combined
        # pass would re-trigger rule 1 on just-created symbols, so the
        # grouping must split them into two folds
        assert _bpe_fold_groups([("xy", "z", 9), ("x", "y", 5)]) == \
            [[("xy", "z")], [("x", "y")]]
        # disjoint, collision-free rules combine into one group
        assert _bpe_fold_groups([("a", "b", 9), ("c", "d", 5)]) == \
            [[("a", "b"), ("c", "d")]]

    def test_combined_fold_equals_sequential(self, spark):
        import random

        from pyspark.sql import functions as F

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            corpus,
        )

        rules = [("a", "b"), ("c", "d"), ("e", "e")]
        hand = [
            ["a", "b"], ["a", "c", "d", "b"], ["c", "a", "b", "d"],
            ["a", "a", "b", "b"], ["c", "c", "d", "d"], ["a"], [],
            ["e", "e", "e"], ["e", "e", "e", "e"],
            ["a", "b", "c", "d", "e", "e"],
            ["b", "a", "d", "c"], ["a", "b", "a", "b", "a"],
        ]
        rng = random.Random(20260817)
        alphabet = ["a", "b", "c", "d", "e", "f"]
        cases = hand + [[rng.choice(alphabet)
                         for _ in range(rng.randint(0, 12))]
                        for _ in range(200)]
        df = spark.createDataFrame(
            [(i, arr) for i, arr in enumerate(cases)],
            "id long, syms array<string>")
        got = {r["id"]: r["out"] for r in
               df.select("id", corpus._bpe_merge_fold_multi(rules)
                         .alias("out")).collect()}
        # vs pure-Python sequential reference AND vs the stacked
        # single-rule Catalyst folds the combined pass replaces
        stacked = df
        for a, b in rules:
            stacked = stacked.withColumn(
                "syms", corpus._bpe_merge_fold(a, b))
        got_stacked = {r["id"]: r["syms"] for r in stacked.collect()}
        for i, arr in enumerate(cases):
            want = self._seq_merge(list(arr), rules)
            assert got[i] == want, (i, arr, got[i], want)
            assert got_stacked[i] == want, (i, arr)

    def test_fold_groups_randomized_collision_batches(self, spark):
        """r12 ADVICE closure: randomized rule BATCHES that include the
        merged-equals-left collision (a composite left like "xy"
        accepted BEFORE the rule ("x","y") whose merged string recreates
        it — the one in-pass hazard ``_bpe_fold_groups`` exists to
        split), driven end-to-end through _bpe_fold_groups +
        _bpe_merge_fold_multi and compared against the pure-Python
        sequential reference. (The converse order — a LEFT equal to an
        earlier rule's merged string — cannot leave _bpe_safe_batch:
        the dirty set already holds a+b when later pairs are vetted, so
        batches here respect that precondition.)"""
        import random

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators import (
            corpus,
        )

        rng = random.Random(20260818)
        for trial in range(6):
            # build a safe-batch-shaped rule list: mutually-disjoint
            # symbol pairs, with 1-2 injected composite-left hazards
            fresh = iter(f"s{trial}_{i}" for i in range(40))
            batch = []
            hazards = rng.randint(1, 2)
            for _ in range(hazards):
                x, y, z = next(fresh), next(fresh), next(fresh)
                batch.append((x + y, z, 9))   # composite left first
                # 0-2 disjoint rules between the hazard pair
                for _ in range(rng.randint(0, 2)):
                    p, q = next(fresh), next(fresh)
                    batch.append((p, q, 5))
                batch.append((x, y, 3))       # merged == earlier left
            for _ in range(rng.randint(0, 3)):
                p, q = next(fresh), next(fresh)
                batch.append((p, q, 2))
            rules = [(a, b) for a, b, _w in batch]
            symbols = sorted({s for r in rules for s in r})
            cases = [[rng.choice(symbols)
                      for _ in range(rng.randint(0, 14))]
                     for _ in range(60)]
            df = spark.createDataFrame(
                [(i, arr) for i, arr in enumerate(cases)],
                "id long, syms array<string>")
            groups = corpus._bpe_fold_groups(batch)
            assert sum(len(g) for g in groups) == len(batch)
            folded = df
            for g in groups:
                folded = folded.select(
                    "id", corpus._bpe_merge_fold_multi(g).alias("syms"))
            got = {r["id"]: r["syms"] for r in folded.collect()}
            for i, arr in enumerate(cases):
                want = self._seq_merge(list(arr), rules)
                assert got[i] == want, (trial, i, arr, got[i], want)


class TestBpeSafeBatchProperty:
    """Spark-free property test of ``corpus._bpe_safe_batch``'s claim:
    batched census merging emits EXACTLY the sequence one-at-a-time
    training would. Random vocabularies over a 3-letter alphabet stress
    the hard cases on purpose — heavy symbol sharing (early dirty stops)
    and merged-string collisions with existing census symbols (the
    2·w_stop escalation path)."""

    @staticmethod
    def _batched_bpe(vocab, n_merges, scan):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.corpus import (
            _bpe_safe_batch,
        )

        ref = TestBpeTrainMerges._ref_bpe
        merges = []
        while len(merges) < n_merges:
            stats = {}
            for syms, f in vocab.items():
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    stats[p] = stats.get(p, 0) + f
            if not stats:
                break
            ranked = sorted(stats.items(),
                            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
            top = [(a, b, w) for (a, b), w in ranked[:scan + 1]]
            batch = _bpe_safe_batch(
                top, scanned_all=len(ranked) <= scan,
                known_merged={m[3] for m in merges})
            batch = batch[:n_merges - len(merges)]
            assert batch, "safe batch must always progress"
            for a, b, w in batch:
                merges.append((len(merges) + 1, a, b, a + b, w))
                new = {}
                for syms, f in vocab.items():
                    out, i = [], 0
                    while i < len(syms):
                        if (i + 1 < len(syms) and syms[i] == a
                                and syms[i + 1] == b):
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    key = tuple(out)
                    new[key] = new.get(key, 0) + f
                vocab = new
        return merges

    def test_batched_equals_sequential_on_random_vocabs(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        tokens = st.text(alphabet="abc", min_size=1, max_size=6)
        vocab_st = st.dictionaries(tokens, st.integers(1, 50),
                                   min_size=1, max_size=20)

        @given(vocab=vocab_st, scan=st.integers(1, 8))
        @settings(max_examples=300, deadline=None)
        def check(vocab, scan):
            v = {tuple(t): f for t, f in vocab.items()}
            want = TestBpeTrainMerges._ref_bpe(dict(v), 12)
            got = self._batched_bpe(dict(v), 12, scan)
            assert got == want

        check()


class TestGroupedAggUdaf:
    def test_matches_builtin_arithmetic(self, spark, sf_dir):
        """The pandas GROUPED_AGG result must equal SUM−MIN−MAX computed
        by built-in JVM aggregates on the same cast column."""
        from pyspark.sql import functions as F

        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.functions.tablefns import (
            udaf_trimmed_sum,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.operators.relational import (
            ld,
        )

        got = {r.l_returnflag: (r.trimmed_qty, r.n_lines)
               for r in udaf_trimmed_sum(spark, sf_dir).collect()}
        ref = {r.l_returnflag: (r.t, r.n) for r in
               ld(spark, sf_dir, "lineitem")
               .select("l_returnflag",
                       F.col("l_quantity").cast("long").alias("q"))
               .groupBy("l_returnflag")
               .agg((F.sum("q") - F.min("q") - F.max("q")).alias("t"),
                    F.count(F.lit(1)).alias("n"))
               .collect()}
        assert got == ref and len(got) >= 2

    def test_plan_is_aggregate_in_pandas(self, spark, sf_dir):
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.functions.tablefns import (
            udaf_trimmed_sum,
        )
        from db2ice_db2_to_snowflake_iceberg_ddl_converter_spark.plans.inspect import (
            executed_plan,
        )

        plan = executed_plan(udaf_trimmed_sum(spark, sf_dir))
        assert "ArrowAggregatePython" in plan or "AggregateInPandas" in plan
        assert "BatchEvalPython" not in plan
