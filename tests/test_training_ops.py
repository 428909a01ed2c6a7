"""Training-data pipeline ops: deterministic sampling, stratified quotas,
sequence packing, n-gram vocabulary counts."""

import collections
import math

import pandas as pd
import pytest

from gdalcubes_spark.pipeline.sampling import deterministic_sample, stratified_sample
from gdalcubes_spark.pipeline.seqpack import pack_sequences
from gdalcubes_spark.pipeline.text import ngram_counts

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


class TestDeterministicSample:
    def test_reproducible_and_nested(self, spark, docs):
        a1 = set(r["doc_id"] for r in deterministic_sample(docs, 0.2).collect())
        a2 = set(r["doc_id"] for r in deterministic_sample(docs.repartition(7), 0.2).collect())
        assert a1 == a2  # partitioning-independent
        small = set(r["doc_id"] for r in deterministic_sample(docs, 0.05).collect())
        assert small <= a1  # hash-threshold samples nest
        n = docs.count()
        assert 0.1 * n < len(a1) < 0.35 * n  # roughly the asked fraction

    def test_bounds(self, spark, docs):
        assert deterministic_sample(docs, 0.0).count() == 0
        assert deterministic_sample(docs, 1.0).count() == docs.count()
        with pytest.raises(ValueError):
            deterministic_sample(docs, 1.5)


class TestStratifiedSample:
    def test_exact_quota_per_group(self, spark, docs):
        out = stratified_sample(docs, "source", 7).groupBy("source").count().collect()
        want = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
        for r in out:
            assert r["count"] == min(7, want[r["source"]])

    def test_partitioning_independent(self, spark, docs):
        a = set(r["doc_id"] for r in stratified_sample(docs, "source", 5).collect())
        b = set(r["doc_id"] for r in stratified_sample(docs.repartition(11), "source", 5).collect())
        assert a == b

    def test_oversample_invariant_exercises_fallback(self, spark, docs):
        """The two-phase threshold cut must return the IDENTICAL sample for
        any oversample factor — oversample=1 leaves ~half the groups short of
        quota (binomial mean == n), so the exact re-rank fallback runs and
        must splice in the same rows the one-window form would pick."""
        want = set(r["doc_id"] for r in stratified_sample(docs, "source", 20, oversample=4).collect())
        for ov in (1, 2):
            got = set(r["doc_id"] for r in stratified_sample(docs, "source", 20, oversample=ov).collect())
            assert got == want, ov


class TestPackSequences:
    MAX = 512

    def _packed(self, spark, docs):
        return pack_sequences(docs, max_len=self.MAX, len_col="n_chars",
                              n_buckets=16).toPandas()

    def test_invariants(self, spark, docs):
        out = self._packed(spark, docs)
        n = docs.count()
        assert len(out) == n and out["doc_id"].nunique() == n  # every doc exactly once
        fill = out.assign(clipped=out["n_tokens"].clip(upper=self.MAX)) \
                  .groupby("bin")["clipped"].sum()
        assert (fill <= self.MAX).all()  # no bin over budget
        assert (out["truncated"] == (out["n_tokens"] > self.MAX)).all()
        # FFD quality: bins within 11/9*LB + 1 per bucket
        for bucket, grp in out.groupby("bucket"):
            lb = math.ceil(grp["n_tokens"].clip(upper=self.MAX).sum() / self.MAX)
            nbins = grp["bin"].nunique()
            assert nbins <= math.ceil(11 / 9 * lb) + 1, (bucket, nbins, lb)

    def test_deterministic(self, spark, docs):
        a = self._packed(spark, docs).sort_values("doc_id").reset_index(drop=True)
        b = pack_sequences(docs.repartition(13), max_len=self.MAX, len_col="n_chars",
                           n_buckets=16).toPandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestNgramCounts:
    def test_matches_python_counter(self, spark, docs):
        got = [(r["ngram"], r["doc_freq"]) for r in ngram_counts(docs, n=2, k=25).collect()]
        cnt = collections.Counter()
        for r in docs.select("text").collect():
            ws = r["text"].lower().strip().split()
            grams = set(" ".join(ws[i:i + 2]) for i in range(max(len(ws) - 1, 1)))
            cnt.update(grams)
        want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
        assert got == want


class TestPiiScan:
    def test_planted_pii_counted_and_redacted(self, spark):
        from gdalcubes_spark.pipeline.text import pii_scan
        rows = [(1, "clean text with no identifiers at all"),
                (2, "reach me at a.b@x.io or b@y.org thanks"),
                (3, "see https://ex.org/a and http://b.c/d now"),
                (4, "call 555-123-4567 ok"),
                (5, "a.b@x.io https://e.f/g 111-222-3333 combo")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in pii_scan(df).collect()}
        assert not got[1]["has_pii"]
        assert got[2]["n_email"] == 2 and got[2]["has_pii"]
        assert got[3]["n_url"] == 2
        assert got[4]["n_phone"] == 1
        assert (got[5]["n_email"], got[5]["n_url"], got[5]["n_phone"]) == (1, 1, 1)
        # redaction removes the PII: hash differs from raw, equal for docs
        # with identical redacted text
        import hashlib
        raw5 = hashlib.md5(rows[4][1].encode()).hexdigest()
        assert got[5]["redacted_md5"] != raw5
        assert got[1]["redacted_md5"] == hashlib.md5(rows[0][1].encode()).hexdigest()

    def test_zero_python_plan(self, spark):
        from gdalcubes_spark.pipeline.text import pii_scan
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = pii_scan(df)._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Exchange" not in plan  # pure codegen projection


class TestNgramContamination:
    def test_planted_leakage_detected(self, spark):
        """Docs that embed a full benchmark sentence flag as contaminated;
        unrelated docs don't; counts match a python set-overlap oracle."""
        from gdalcubes_spark.pipeline.text import ngram_contamination
        bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
        rows = [(1, "completely unrelated words " + " ".join(f"w{i}" for i in range(12))),
                (2, "prefix words " + bench_text + " suffix words here"),
                (3, bench_text),
                (4, "another clean doc " + " ".join(f"x{i}" for i in range(12)))]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        bench = spark.createDataFrame([(100, bench_text)], "doc_id long, text string")
        got = {r["doc_id"]: r for r in ngram_contamination(docs, bench, n=8).collect()}
        assert len(got) == 4
        assert got[2]["contaminated"] and got[3]["contaminated"]
        assert not got[1]["contaminated"] and not got[4]["contaminated"]
        # python oracle for the counts
        def grams(t, n=8):
            ws = t.lower().strip().split()
            return set(" ".join(ws[i:i + n]) for i in range(max(len(ws) - n, 0) + 1))
        bg = grams(bench_text)
        for did, text in rows:
            g = grams(text)
            assert got[did]["n_grams"] == len(g)
            assert got[did]["n_contaminated"] == len(g & bg)

    def test_bench_side_is_broadcast(self, spark):
        from gdalcubes_spark.pipeline.text import ngram_contamination
        docs = spark.createDataFrame([(1, "a b c d e f g h i")], "doc_id long, text string")
        plan = ngram_contamination(docs, docs, n=4)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # membership test never shuffles the corpus


class TestBpeTokenCounts:
    def test_hand_checked_examples(self, spark):
        from gdalcubes_spark.pipeline.text import bpe_token_counts
        rows = [
            # "it's a test" → ["it", "'s", " a", " test"] = 4 pre-tokens
            (0, "it's a test"),
            # "x = 42;" → ["x", " =", " 42", ";"] = 4
            (1, "x = 42;"),
            # "hello" → 1
            (2, "hello"),
            # digits split from letters: "abc123" → ["abc", "123"] = 2
            (3, "abc123"),
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        got = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_counts(df).collect()}
        assert got == {0: 4, 1: 4, 2: 1, 3: 2}

    def test_matches_python_re_on_corpus(self, spark):
        import regex  # stdlib 're' lacks \p classes; fall back if absent
        from gdalcubes_spark.pipeline.text import BPE_PRETOKEN_RE, bpe_token_counts
        docs = spark.read.parquet(f"{SF}/documents.parquet").filter("doc_id < 100")
        got = {r["doc_id"]: r["n_bpe_tokens"] for r in bpe_token_counts(docs).collect()}
        pat = regex.compile(BPE_PRETOKEN_RE)
        for r in docs.select("doc_id", "text").collect():
            assert got[r["doc_id"]] == len(pat.findall(r["text"])), r["doc_id"]

    def test_zero_shuffle_plan(self, spark):
        from gdalcubes_spark.pipeline.text import bpe_token_counts
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        plan = bpe_token_counts(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestTfidf:
    def test_matches_python_oracle(self, spark):
        import collections
        import math
        from gdalcubes_spark.pipeline.text import tfidf_top_terms
        docs = spark.read.parquet(f"{SF}/documents.parquet").filter("doc_id < 60")
        got = tfidf_top_terms(docs, k=3).toPandas()
        rows = docs.select("doc_id", "text").collect()
        n = len(rows)
        tf = {}
        dfc = collections.Counter()
        for r in rows:
            toks = [t for t in r["text"].lower().split(" ") if t]
            c = collections.Counter(toks)
            tf[r["doc_id"]] = c
            dfc.update(c.keys())
        for did, c in tf.items():
            scored = sorted(
                ((round(cnt * (math.log((n + 1.0) / (dfc[t] + 1.0)) + 1.0), 6), t, cnt)
                 for t, cnt in c.items()),
                key=lambda x: (-x[0], x[1]))[:3]
            g = got[got.doc_id == did].sort_values(["tfidf", "tok"], ascending=[False, True])
            assert [(s, t) for s, t, _ in scored] == list(zip(g["tfidf"], g["tok"])), did

    def test_k_rows_per_doc(self, spark):
        from gdalcubes_spark.pipeline.text import tfidf_top_terms
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = tfidf_top_terms(docs, k=2).toPandas()
        per = got.groupby("doc_id").size()
        assert (per <= 2).all() and len(per) == docs.count()


class TestSemanticDedup:
    def test_clone_clusters(self, spark):
        from gdalcubes_spark.pipeline.components import dedup_clusters
        from gdalcubes_spark.pipeline.similarity import cosine_neardup_pairs_bucketed
        import pyspark.sql.functions as F
        emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
               .filter("vec_id < 100")
               .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")))
        clones = emb.select((F.col("vec_id") + 100000).alias("vec_id"),
                            F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"))
        allv = emb.unionByName(clones)
        pairs = cosine_neardup_pairs_bucketed(allv, threshold=0.999)
        out = dedup_clusters(allv, pairs, id_col="vec_id").toPandas()
        assert len(out) == 200
        by_id = out.set_index("vec_id")
        for i in range(100):
            # each clone joins its source's cluster; source (min id) is kept
            assert by_id.loc[i, "cluster"] == by_id.loc[i + 100000, "cluster"]
            assert by_id.loc[i + 100000, "cluster"] <= i
            assert not by_id.loc[i + 100000, "keep"]
        # keep flags: exactly one representative per cluster
        reps = out[out.keep]
        assert reps["cluster"].is_unique and set(reps["cluster"]) == set(out["cluster"])


class TestMixtureByTokens:
    BUDGETS = {"src0": 800.0, "src1": 300.0, "src2": 1.0, "src3": 10_000_000.0}

    def test_two_phase_equals_one_window(self, spark):
        from gdalcubes_spark.pipeline.sampling import mixture_by_tokens, mixture_by_tokens_naive
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = mixture_by_tokens(docs, self.BUDGETS).toPandas()
        want = mixture_by_tokens_naive(docs, self.BUDGETS).toPandas()
        key = lambda p: sorted(map(tuple, p[["doc_id", "source", "n_tokens"]].to_numpy()))
        assert key(got) == key(want)

    def test_budget_semantics(self, spark):
        from gdalcubes_spark.pipeline.sampling import mixture_by_tokens
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = mixture_by_tokens(docs, self.BUDGETS).toPandas()
        sums = got.groupby("source")["n_tokens"].sum()
        counts = got.groupby("source").size()
        # greedy prefix: budget met (or the whole source taken), never
        # exceeded by more than the boundary doc
        maxdoc = got.groupby("source")["n_tokens"].max()
        assert sums["src0"] >= 800 and sums["src0"] - maxdoc["src0"] < 800
        assert sums["src1"] >= 300 and sums["src1"] - maxdoc["src1"] < 300
        assert counts["src2"] == 1                 # tiny budget → boundary doc only
        assert counts["src3"] == 25                # huge budget → whole source
        assert set(got["source"]) == set(self.BUDGETS)  # unbudgeted sources absent

    def test_deterministic_and_partitioning_independent(self, spark):
        from gdalcubes_spark.pipeline.sampling import mixture_by_tokens
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        a = mixture_by_tokens(docs, self.BUDGETS).toPandas()
        b = mixture_by_tokens(docs.repartition(17), self.BUDGETS).toPandas()
        key = lambda p: sorted(map(tuple, p.to_numpy()))
        assert key(a) == key(b)


class TestCurriculumShards:
    def test_shard_semantics(self, spark):
        from gdalcubes_spark.pipeline.sampling import curriculum_shards
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        got = curriculum_shards(docs, n_shards=10).toPandas()
        assert len(got) == 500 and got["shard"].between(0, 9).all()
        # monotone: every doc in shard s+1 has quality >= every doc in shard s
        by = got.groupby("shard")["quality"]
        mins, maxs = by.min(), by.max()
        for s in range(int(got["shard"].max())):
            if s in maxs.index and s + 1 in mins.index:
                assert maxs[s] <= mins[s + 1] + 1e-12
        # deterministic and partitioning-independent
        again = curriculum_shards(docs.repartition(13), n_shards=10).toPandas()
        a = got.sort_values("doc_id").reset_index(drop=True)
        b = again.sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 15, "d"), (3, 5, "e")],
            "k int, ts int, tag string")
        right = spark.createDataFrame(
            [(1, 10, 100.0), (1, 25, 250.0), (2, 15, 150.0), (2, 16, 160.0)],
            "k int, ts int, v double")
        return left, right

    def test_latest_prior_or_equal(self, spark):
        from gdalcubes_spark.pipeline.joins import asof_join
        left, right = self._frames(spark)
        got = {r["tag"]: r["v_r"] for r in asof_join(left, right, on="k", ts="ts").collect()}
        assert got == {"a": 100.0,   # equal ts counts
                       "b": 100.0,   # 25 is later than 20 → falls back to 10
                       "c": 250.0,
                       "d": 150.0,   # equal ts
                       "e": None}    # no prior right row

    def test_strict_excludes_equal_ts(self, spark):
        from gdalcubes_spark.pipeline.joins import asof_join
        left, right = self._frames(spark)
        got = {r["tag"]: r["v_r"] for r in
               asof_join(left, right, on="k", ts="ts", strict=True).collect()}
        assert got["a"] is None      # equal ts no longer visible
        assert got["d"] is None
        assert got["b"] == 100.0 and got["c"] == 250.0

    def test_single_exchange_plan(self, spark):
        from gdalcubes_spark.pipeline.joins import asof_join
        left, right = self._frames(spark)
        plan = asof_join(left, right, on="k", ts="ts")._jdf.queryExecution() \
            .executedPlan().toString()
        # union-window form: ONE shuffle on the key, no join operator at all
        assert plan.count("Exchange") == 1
        assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan

    def test_matches_duckdb_asof_on_events(self, spark):
        import duckdb
        from gdalcubes_spark.pipeline.joins import asof_join
        ev = spark.read.parquet(f"{SF}/events.parquet")
        import pyspark.sql.functions as F
        clicks = (ev.filter("event_type = 'click'")
                  .select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")))
        views = (ev.filter("event_type = 'view'")
                 .groupBy("user_id", F.date_trunc("minute", F.col("ts").cast("timestamp")).alias("ts"))
                 .agg(F.count("*").alias("n_views")))
        got = (asof_join(clicks, views, on="user_id", ts="ts")
               .select("event_id", F.coalesce("n_views_r", F.lit(0)).alias("n"))
               .toPandas().sort_values("event_id").reset_index(drop=True))
        want = duckdb.sql(f"""
            WITH e AS (SELECT * FROM '{SF}/events.parquet'),
            c AS (SELECT event_id, user_id, ts FROM e WHERE event_type = 'click'),
            v AS (SELECT user_id, DATE_TRUNC('minute', ts) ts, COUNT(*) n
                  FROM e WHERE event_type = 'view' GROUP BY 1, 2)
            SELECT c.event_id, COALESCE(v.n, 0) AS n
            FROM c ASOF LEFT JOIN v ON c.user_id = v.user_id AND c.ts >= v.ts
            ORDER BY event_id
        """).df()
        assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
        assert (got["n"].to_numpy() == want["n"].to_numpy()).all()

    def test_shared_column_name_not_clobbered(self, spark):
        # left and right both carry a column named "v": the right value must
        # survive into v_r (regression: null-grafting used to overwrite it)
        from gdalcubes_spark.pipeline.joins import asof_join
        left = spark.createDataFrame([(1, 10, 111.0)], "k int, ts int, v double")
        right = spark.createDataFrame([(1, 5, 222.0)], "k int, ts int, v double")
        out = asof_join(left, right, on="k", ts="ts").collect()[0]
        assert out["v"] == 111.0 and out["v_r"] == 222.0
