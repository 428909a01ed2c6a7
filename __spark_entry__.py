"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship: deterministic cube derived from sf0.001 lineitem →
                 reduce_time + zonal stats (the BASELINE.json metric shape).
queries()      — one entry per implemented operator (SURVEY.md §2); each runs
                 the REAL cube machinery (chunk tensors, Arrow UDFs) and
                 returns a long-format DataFrame.
oracle_sql()   — ANSI-SQL equivalents DuckDB runs on the same parquet views.

The cube inputs are derived deterministically from the lineitem table
(it = l_orderkey % NT, iy = l_partkey % NY, ix = l_suppkey % NX,
value = sum(l_quantity)) so Spark and DuckDB compute from identical data.
Aggregate choices keep float64 arithmetic exact (integer-valued sums) so
value hashes match bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NT, NY, NX = 6, 20, 20

_CELLS_CTE = f"""
WITH cells AS (
  SELECT CAST(l_orderkey % {NT} AS INTEGER) AS it,
         CAST(l_partkey % {NY} AS INTEGER) AS iy,
         CAST(l_suppkey % {NX} AS INTEGER) AS ix,
         CAST('v' AS VARCHAR) AS band,
         CAST(SUM(l_quantity) AS DOUBLE) AS value
  FROM lineitem
  GROUP BY 1, 2, 3
)
"""


def _utc(spark: SparkSession) -> SparkSession:
    """The driver runs queries in ITS session; timestamp-derived columns
    (F.window, date_format, F.year in the scan's time index) are
    session-TZ-dependent while the DuckDB oracles are TZ-naive — pin UTC."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def _lineitem_cube(spark: SparkSession, sf_dir: str, chunking=None):
    """Deterministic 6×20×20 cube from lineitem (see module docstring)."""
    _utc(spark)
    from gdalcubes_spark.cube import Cube
    from gdalcubes_spark.grid import ChunkGrid, CubeView

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cells = (li.groupBy((F.col("l_orderkey") % NT).cast("int").alias("it"),
                        (F.col("l_partkey") % NY).cast("int").alias("iy"),
                        (F.col("l_suppkey") % NX).cast("int").alias("ix"))
             .agg(F.sum("l_quantity").cast("double").alias("value"))
             .withColumn("band", F.lit("v"))
             .select("it", "iy", "ix", "band", "value"))
    view = CubeView.create(srs="EPSG:4326", left=0, right=NX, bottom=0, top=NY,
                           t0="2021-01-01", t1="2021-01-06", dt="P1D", dx=1.0, dy=1.0)
    g = chunking or ChunkGrid(nt=NT, ny=NY, nx=NX, ct=2, cy=8, cx=8)
    return Cube.from_cells(cells, view, ["v"], g)


def _rect_features(spark: SparkSession) -> DataFrame:
    from gdalcubes_spark.geom import rect_wkt
    rows = [(1, rect_wkt(0, 10, 10, 20)),   # NW quadrant
            (2, rect_wkt(10, 0, 20, 10)),   # SE quadrant
            (3, rect_wkt(5, 5, 15, 15))]    # center, crosses chunk borders
    return spark.createDataFrame(rows, "fid long, wkt string")


_RECTS_SQL = "(VALUES (1, 0.0, 10.0, 10.0, 20.0), (2, 10.0, 0.0, 20.0, 10.0), (3, 5.0, 5.0, 15.0, 15.0)) AS rects(fid, rl, rb, rr, rt)"


# --------------------------------------------------------------------------
# flagship
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Monthly-median-style flagship at sf0.001: cube → reduce_time(median)
    → zonal statistics over polygons (the BASELINE.json metric shape)."""
    from gdalcubes_spark.operators.extract_geom import zonal_stats

    cube = _lineitem_cube(spark, "/root/testdata/sf0.001")
    reduced = cube.reduce_time("median(v)", "count(v)", names=["v", "n"])
    return zonal_stats(reduced, _rect_features(spark), ["mean", "count"], by_time=True)


# --------------------------------------------------------------------------
# queries + oracles
# --------------------------------------------------------------------------

def _q_reduce_time(spark, sf_dir):
    c = _lineitem_cube(spark, sf_dir)
    r = c.reduce_time("mean(v)", "min(v)", "max(v)", "median(v)")
    return r.cells().select("iy", "ix", "band", "value")


def _q_reduce_quantiles(spark, sf_dir):
    """Q1/Q3 (Hyndman-Fan 7 == quantile_cont) + sample var/sd, rounded on
    both sides (two-pass numpy vs single-pass DuckDB differ in last ulps)."""
    c = _lineitem_cube(spark, sf_dir)
    r = c.reduce_time("Q1(v)", "Q3(v)", "var(v)", "sd(v)")
    return (r.cells().select("iy", "ix", "band", F.round("value", 6).alias("value")))


def _q_reduce_counts(spark, sf_dir):
    """count/sum/prod + which_min/which_max reducers. prod works on v%7+1
    (≤ 7^6 — float64-exact); which_* return the winning slice's to_double()
    datetime code (reduce_time.cpp:188-236). Spatial cells with zero data
    are excluded on both sides (the cube emits count=0/sum=0/prod=1 for
    all-NaN cells inside a non-empty chunk; SQL has no such groups)."""
    c = _lineitem_cube(spark, sf_dir)
    p = c.apply_pixel("v % 7 + 1", ["p"], keep_bands=False)
    r = p.reduce_time("count(p)", "sum(p)", "prod(p)", "which_min(p)", "which_max(p)")
    cells = r.cells()
    nonempty = (cells.filter((F.col("band") == "p_count") & (F.col("value") > 0))
                .select("iy", "ix").distinct())
    return (cells.join(F.broadcast(nonempty), ["iy", "ix"])
            .select("iy", "ix", "band", "value"))


def _q_reduce_space(spark, sf_dir):
    c = _lineitem_cube(spark, sf_dir)
    r = c.reduce_space("mean(v)", "min(v)", "max(v)")
    return r.cells().select("it", "band", "value")


def _q_apply_pixel(spark, sf_dir):
    c = _lineitem_cube(spark, sf_dir)
    return (c.apply_pixel("v * 2 + ix + iy + it", ["w"]).cells()
            .select("it", "iy", "ix", "band", "value"))


def _q_filter_pixel(spark, sf_dir):
    c = _lineitem_cube(spark, sf_dir)
    return c.filter_pixel("v % 7 > 3").cells().select("it", "iy", "ix", "band", "value")


def _q_crop(spark, sf_dir):
    c = _lineitem_cube(spark, sf_dir)
    r = c.crop(left=5, right=15, bottom=5, top=15, t0="2021-01-02", t1="2021-01-05")
    return r.cells().select("it", "iy", "ix", "band", "value")


def _q_slice_time(spark, sf_dir):
    c = _lineitem_cube(spark, sf_dir)
    return c.slice_time(t="2021-01-04").cells().select("it", "iy", "ix", "band", "value")


def _q_slice_space(spark, sf_dir):
    c = _lineitem_cube(spark, sf_dir)
    return c.slice_space(ix=7, iy=3).cells().select("it", "iy", "ix", "band", "value")


def _q_select_time(spark, sf_dir):
    c = _lineitem_cube(spark, sf_dir)
    return c.select_time(["2021-01-02", "2021-01-05"]).cells().select("it", "iy", "ix", "band", "value")


def _q_cube_histogram(spark, sf_dir):
    """Per-band value histogram over all cube cells (data-QA distribution
    summary; partial-aggregated to band×bins before the single shuffle)."""
    from gdalcubes_spark.operators.reduce import value_histogram
    c = _lineitem_cube(spark, sf_dir)
    return value_histogram(c, bins=16, vmin=0.0, vmax=500.0)


def _q_zonal_stats(spark, sf_dir):
    from gdalcubes_spark.operators.extract_geom import zonal_stats
    c = _lineitem_cube(spark, sf_dir)
    zs = zonal_stats(c, _rect_features(spark), ["mean", "count", "min", "max"], by_time=True)
    return zs.select("fid", "time", "v_mean", "v_count", "v_min", "v_max")


def _q_filter_geom(spark, sf_dir):
    c = _lineitem_cube(spark, sf_dir)
    r = c.filter_geom("POLYGON ((2 2, 18 2, 18 18, 2 18, 2 2), (8 8, 12 8, 12 12, 8 12, 8 8))")
    return r.cells().select("it", "iy", "ix", "band", "value")


def _q_aggregate_time(spark, sf_dir):
    c = _lineitem_cube(spark, sf_dir)
    return c.aggregate_time(fact=2, method="mean").cells().select("it", "iy", "ix", "band", "value")


def _q_aggregate_space(spark, sf_dir):
    c = _lineitem_cube(spark, sf_dir)
    return c.aggregate_space(fact=2, method="max").cells().select("it", "iy", "ix", "band", "value")


def _q_window_time(spark, sf_dir):
    c = _lineitem_cube(spark, sf_dir)
    r = c.window_time((1, 1), reducer="sum(v)")
    return r.cells().select("it", "iy", "ix", "band", "value")


def _q_window_space(spark, sf_dir):
    c = _lineitem_cube(spark, sf_dir)
    r = c.window_space(reducer="sum(v)", window=(3, 3))
    return r.cells().select("it", "iy", "ix", "band", "value")


def _q_fill_time(spark, sf_dir):
    """All three gap-fill methods (locf/linear/near) in ONE oracled query,
    tagged by a method column — merged in round 5 to free driver-budget
    slots (the driver runs the first 50 queries) for the new ANN-recall and
    multimodal oracles without losing any value-hash coverage."""
    c = _lineitem_cube(spark, sf_dir)
    locf = (c.fill_time("locf").cells()
            .select(F.lit("locf").alias("method"), "it", "iy", "ix", "band", "value"))
    lin = (c.fill_time("linear").cells()
           .select(F.lit("linear").alias("method"), "it", "iy", "ix", "band",
                   F.round("value", 6).alias("value")))
    near = (c.fill_time("near").cells()
            .select(F.lit("near").alias("method"), "it", "iy", "ix", "band", "value"))
    return locf.unionByName(lin).unionByName(near)


def _q_join_bands(spark, sf_dir):
    from gdalcubes_spark.cube import Cube
    from gdalcubes_spark.grid import ChunkGrid, CubeView
    c1 = _lineitem_cube(spark, sf_dir)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cells_w = (orders.groupBy((F.col("o_orderkey") % NT).cast("int").alias("it"),
                              (F.col("o_custkey") % NY).cast("int").alias("iy"),
                              (F.col("o_orderkey") % NX).cast("int").alias("ix"))
               .agg(F.count("*").cast("double").alias("value"))
               .withColumn("band", F.lit("w"))
               .select("it", "iy", "ix", "band", "value"))
    c2 = Cube.from_cells(cells_w, c1.view, ["w"], c1.chunking)
    j = c1.join_bands(c2)
    return j.cells().select("it", "iy", "ix", "band", "value")


# --- training-data pipeline queries (documents / embeddings tables) --------

def _docs_with_clones(spark, sf_dir):
    """Deterministic near/exact clones so dedup has real work (documents
    themselves are all unique)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").filter("doc_id < 120")
    near = d.select((F.col("doc_id") + 100000).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(" zzzclone")).alias("text"))
    exact = d.select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    return d.unionByName(near).unionByName(exact)


_CLONES_SQL = """
docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 120
  UNION ALL SELECT doc_id + 100000, text || ' zzzclone' FROM documents WHERE doc_id < 120
  UNION ALL SELECT doc_id + 200000, text FROM documents WHERE doc_id < 120
)
"""


def _q_text_stats(spark, sf_dir):
    from gdalcubes_spark.pipeline.text import text_features
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return text_features(d).select("doc_id", "n_tokens", "stop_ratio", "quality", "lang_pred", "fingerprint")


def _q_text_tokens(spark, sf_dir):
    """BPE-ish pre-token counting (GPT-2 pre-tokenizer classes, RE2-safe
    regex shared verbatim with the DuckDB oracle) — token-budget sizing for
    training corpora; one codegen projection, zero shuffle."""
    from gdalcubes_spark.pipeline.text import bpe_token_counts
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_token_counts(d)


def _q_text_tfidf(spark, sf_dir):
    """Per-doc top-3 tf-idf terms (smooth idf, sklearn convention) — two
    map-side-combinable shuffles + one tok equi-join; DuckDB-oracled."""
    from gdalcubes_spark.pipeline.text import tfidf_top_terms
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tfidf_top_terms(d, k=3)


def _q_text_winnow(spark, sf_dir):
    """Winnowing fingerprints: md5 window hashes, smallest-4 per doc —
    zero-shuffle codegen plan with a bit-identical DuckDB oracle."""
    from gdalcubes_spark.pipeline.text import rolling_fingerprints
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text").filter("doc_id < 200")
    return rolling_fingerprints(d)


def _q_text_decontaminate(spark, sf_dir):
    """Benchmark decontamination (training-corpus leakage gate): per-doc
    count of distinct 8-gram hashes shared with the 'benchmark' slice
    (doc_id % 41 == 0 stands in for the eval set). Benchmark grams
    broadcast; corpus side is one codegen explode + two combinable
    groupBys. DuckDB-oracled via identical md5 gram hashes."""
    from gdalcubes_spark.pipeline.text import ngram_contamination
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_contamination(d, d.filter("doc_id % 41 = 0"), n=8)


_PII_PLANT = " contact bob@example.com or https://ex.org/x 555-123-4567"


def _q_text_pii_scan(spark, sf_dir):
    """PII scrubbing gate (pre-training privacy filter): per-doc email/url/
    phone counts + redacted-text md5, on documents with synthetic PII
    planted in every 7th doc (the corpus itself is clean). One codegen
    projection, zero shuffle; RE2-safe patterns → DuckDB-oracled including
    the redaction hash."""
    from gdalcubes_spark.pipeline.text import pii_scan
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    planted = d.select(
        "doc_id",
        F.concat(F.col("text"),
                 F.when(F.col("doc_id") % 7 == 0, F.lit(_PII_PLANT))
                 .otherwise(F.lit(""))).alias("text"))
    return pii_scan(planted)


def _q_dedup_exact(spark, sf_dir):
    from gdalcubes_spark.pipeline.dedup import exact_dedup
    return exact_dedup(_docs_with_clones(spark, sf_dir)).select("doc_id", "n_copies")


def _q_dedup_jaccard(spark, sf_dir):
    from gdalcubes_spark.pipeline.dedup import jaccard_pairs
    return jaccard_pairs(_docs_with_clones(spark, sf_dir), threshold=0.5).select("ida", "idb", "jaccard")


def _q_dedup_minhash_lsh(spark, sf_dir):
    from gdalcubes_spark.pipeline.dedup import minhash_lsh_pairs
    return minhash_lsh_pairs(_docs_with_clones(spark, sf_dir), threshold=0.8).select("ida", "idb", "jaccard")


def _q_dedup_simhash_md5(spark, sf_dir):
    """Engine-agnostic SimHash (60-bit, md5 token hashes): the banded-bucket
    near-dup join's output is compared against a DuckDB brute-force all-pairs
    Hamming scan computing the IDENTICAL signatures — the one dedup pipeline
    where signature, banding guarantee, and verify are all oracled at once."""
    from gdalcubes_spark.pipeline.dedup import simhash_near_pairs
    return simhash_near_pairs(_docs_with_clones(spark, sf_dir), max_hamming=3,
                              hash_fn="md5").select("ida", "idb", "hamming")


def _q_sample_det(spark, sf_dir):
    """Deterministic corpus sampling: md5-bucket filter — same rows every
    run on any partitioning; the SQL oracle recomputes the identical hash."""
    from gdalcubes_spark.pipeline.sampling import deterministic_sample
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return deterministic_sample(d, 0.15).select("doc_id", "source")


def _q_sample_stratified(spark, sf_dir):
    """Stratified training-mix quota: exactly min(n, |group|) docs per source,
    chosen by hash order (reproducible)."""
    from gdalcubes_spark.pipeline.sampling import stratified_sample
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return stratified_sample(d, "source", 25).select("doc_id", "source")


_MIX_BUDGETS = {"src0": 800.0, "src1": 300.0, "src5": 1.0, "src7": 10_000_000.0}


def _q_sample_mixture(spark, sf_dir):
    """Token-budget data mixture (per-source greedy hash-ordered prefix
    until the source's TOKEN budget is met) — two-phase exact plan; the
    DuckDB oracle is the naive one-window form."""
    from gdalcubes_spark.pipeline.sampling import mixture_by_tokens
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return mixture_by_tokens(d, _MIX_BUDGETS)


def _q_curriculum(spark, sf_dir):
    """Quality-quantile curriculum shards (broadcast thresholds, no global
    sort) — DuckDB-oracled via quantile_cont parity."""
    from gdalcubes_spark.pipeline.sampling import curriculum_shards
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return curriculum_shards(d, n_shards=10)


def _q_text_ngrams(spark, sf_dir):
    """Top-50 bigrams by document frequency (vocabulary / contamination
    audit): per-row distinct-gram arrays in codegen, one shuffle, TakeOrdered."""
    from gdalcubes_spark.pipeline.text import ngram_counts
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_counts(d, n=2, k=50)


def _q_text_quality_by_source(spark, sf_dir):
    """Per-source quality distribution (training-mix audit): exact quartiles
    of the codegen quality score, grouped by source. Spark `percentile` and
    DuckDB `quantile_cont` share the HF-7 linear-interpolation definition
    (same alignment as the cube_reduce_quantiles oracle)."""
    from gdalcubes_spark.pipeline.text import quality_sql
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = d.select("source", F.expr(quality_sql("text")).alias("q"))
    return (q.groupBy("source").agg(
        F.expr("percentile(q, 0.25)").alias("q1"),
        F.expr("percentile(q, 0.5)").alias("q2"),
        F.expr("percentile(q, 0.75)").alias("q3"),
        F.count("*").alias("n_docs"))
        .select("source", F.round("q1", 6).alias("q1"), F.round("q2", 6).alias("q2"),
                F.round("q3", 6).alias("q3"), "n_docs"))


def _q_dedup_clusters(spark, sf_dir):
    """Duplicate CLUSTERS, not just pairs: minhash-LSH pair graph → alternating
    large-star/small-star connected components → every doc labeled with its
    component min, cluster size, and a keep flag. Oracle: the exact-Jaccard
    pair CTE + a recursive transitive-closure CTE in DuckDB."""
    from gdalcubes_spark.pipeline.components import dedup_clusters
    from gdalcubes_spark.pipeline.dedup import minhash_lsh_pairs
    docs = _docs_with_clones(spark, sf_dir)
    pairs = minhash_lsh_pairs(docs, threshold=0.8)
    return dedup_clusters(docs, pairs)


def _q_ann_topk(spark, sf_dir):
    from gdalcubes_spark.pipeline.similarity import brute_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter("vec_id % 100 = 0")
    return brute_topk(emb, queries, k=5).select("query_id", "neighbor_id", "sim")


def _q_ann_recall_gate(spark, sf_dir):
    """DRIVER-ORACLED gate for the whole approximate-ANN family (r4 VERDICT
    item 2): runs all four index layouts (hyperplane LSH, IVF-flat, PQ-ADC,
    IVF-PQ) with the same parameters as their standalone queries, measures
    recall@5 of each against the exact brute-force top-k IN-QUERY, and emits
    one row per (method, query_id): the brute top-k id set (comma-joined,
    ascending), the brute min similarity, and recall_ok = recall ≥ the
    method's floor. DuckDB reproduces the brute side exactly (the ann_topk
    oracle construction) and asserts recall_ok literally TRUE — so an ANN
    regression (empty buckets, broken codebooks, wrong re-rank) flips the
    boolean and fails the value-hash gate. recall_ok gates the method's MEAN
    recall over the query set (per-query recall@5 is 0.2-granular); floors
    sit at ~half the deterministic seeded means (measured sf0.001/sf0.01:
    lsh 0.92/0.96, ivf 0.64/0.56, pq 0.64/0.68, ivfpq 0.60/0.84) but far
    above chance (k/N = 0.01). The four standalone ann_* queries stay
    rows-only under the driver's 50-query budget; this single row gates all
    four paths."""
    from gdalcubes_spark.pipeline.similarity import (brute_topk, hyperplane_lsh_topk,
                                                     ivf_topk, ivfpq_topk, pq_topk)
    K = 5
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter("vec_id % 100 = 0")
    brute = brute_topk(emb, queries, k=K).cache()
    base = (brute.groupBy("query_id")
            .agg(F.concat_ws(",", F.transform(F.sort_array(F.collect_list("neighbor_id")),
                                              lambda x: x.cast("string"))).alias("brute_ids"),
                 F.round(F.min("sim"), 6).alias("brute_min_sim")))
    methods = [
        ("lsh", 0.5, hyperplane_lsh_topk(emb, queries, k=K, n_planes=4, n_tables=16)),
        ("ivf", 0.3, ivf_topk(emb, queries, k=K, n_centroids=16, n_probe=4,
                              train_full_corpus=True)),
        ("pq", 0.3, pq_topk(emb, queries, k=K, m=8, ks=32, refine=4)),
        ("ivfpq", 0.3, ivfpq_topk(emb, queries, k=K, n_centroids=16, n_probe=6,
                                  m=8, ks=32, refine=4, train_full_corpus=True)),
    ]
    bset = brute.select("query_id", "neighbor_id")
    out = None
    for name, floor, ann in methods:
        # mean recall over the query set as a lazy 1-row aggregate (no
        # driver-side action inside the query builder)
        mean_rec = (bset.join(ann, ["query_id", "neighbor_id"], "left_semi")
                    .agg((F.count("*") / F.lit(K)).alias("n_ok"))
                    .crossJoin(queries.agg(F.count("*").alias("n_q")))
                    .select((F.col("n_ok") / F.col("n_q")).alias("mean_recall")))
        row = (base.crossJoin(mean_rec)
               .select(F.lit(name).alias("method"), "query_id", "brute_ids", "brute_min_sim",
                       (F.col("mean_recall") >= floor).alias("recall_ok")))
        out = row if out is None else out.unionByName(row)
    return out


def _q_embed_neardup(spark, sf_dir):
    """Embedding-cosine near-dup: plant scaled clones (cosine exactly 1 with
    their source), find all pairs ≥ 0.999. Runs the BUCKETED path
    (hyperplane sign buckets → executor-side exact verify, no driver pass);
    scaled clones have identical sign patterns, so recall on them is exact
    and the DuckDB all-pairs oracle still matches hash-for-hash."""
    from gdalcubes_spark.pipeline.similarity import cosine_neardup_pairs_bucketed
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")))
    clones = emb.select((F.col("vec_id") + 100000).alias("vec_id"),
                        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"))
    return cosine_neardup_pairs_bucketed(emb.unionByName(clones), threshold=0.999)


def _q_semantic_dedup(spark, sf_dir):
    """END-TO-END semantic dedup: bucketed embedding near-dup pairs →
    large-star/small-star connected components → every vector labeled
    (cluster, cluster_size, keep). The full keep/drop decision a training
    pipeline consumes, oracled by the all-pairs cosine CTE + recursive
    transitive closure in DuckDB."""
    from gdalcubes_spark.pipeline.components import dedup_clusters
    from gdalcubes_spark.pipeline.similarity import cosine_neardup_pairs_bucketed
    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding")))
    clones = emb.select((F.col("vec_id") + 100000).alias("vec_id"),
                        F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"))
    allv = emb.unionByName(clones)
    pairs = cosine_neardup_pairs_bucketed(allv, threshold=0.999)
    return dedup_clusters(allv, pairs, id_col="vec_id")


def _q_ann_lsh(spark, sf_dir):
    """rows-only: approximate by design; pytest reports recall vs brute."""
    from gdalcubes_spark.pipeline.similarity import hyperplane_lsh_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter("vec_id % 100 = 0")
    return hyperplane_lsh_topk(emb, queries, k=5, n_planes=4, n_tables=16)


def _q_ann_ivf(spark, sf_dir):
    """rows-only: approximate by design (probe n_probe of n_centroids lists);
    pytest reports recall vs brute force. train_full_corpus=True so the
    driver gate exercises the DISTRIBUTED Lloyd's refinement
    (pipeline/clustering.py), not just the seeded driver-side sample."""
    from gdalcubes_spark.pipeline.similarity import ivf_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter("vec_id % 100 = 0")
    return ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=4,
                    train_full_corpus=True)


def _q_ann_pq(spark, sf_dir):
    """rows-only: product-quantization ADC top-k (Jégou+ TPAMI'11) with exact
    zip_with re-rank of the refine·k ADC candidates — the 100 TB scan reads
    m-byte codes (32× smaller than the float32 vectors); pytest reports
    recall vs brute force and sim-exactness of agreeing pairs."""
    from gdalcubes_spark.pipeline.similarity import pq_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter("vec_id % 100 = 0")
    return pq_topk(emb, queries, k=5, m=8, ks=32, refine=4)


def _q_ann_ivfpq(spark, sf_dir):
    """rows-only: IVF list pruning + PQ-ADC candidate scoring + exact
    re-rank — the billion-scale production ANN layout; pytest reports recall
    vs brute and sim-exactness of agreeing pairs. train_full_corpus=True so
    the coarse quantizer runs the distributed Lloyd's path under the gate."""
    from gdalcubes_spark.pipeline.similarity import ivfpq_topk
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter("vec_id % 100 = 0")
    return ivfpq_topk(emb, queries, k=5, n_centroids=16, n_probe=6, m=8, ks=32, refine=4,
                      train_full_corpus=True)


def _q_apply_time_cumsum(spark, sf_dir):
    """apply_time (per-pixel time-series UDF, the R streaming analogue)
    running a cumulative sum along t — the one per-pixel-series op a SQL
    window can reproduce, so the streamed-UDF path gets a DuckDB oracle.
    Absent slices count as 0 in the running sum but the output stays NaN
    there (s*0.0 re-poisons), matching SUM() OVER (PARTITION BY cell ORDER BY
    it) over the present-rows-only oracle CTE; both sum in ascending-t order,
    so the doubles are bit-identical."""
    import numpy as np
    from gdalcubes_spark.operators.stream import apply_time
    c = _lineitem_cube(spark, sf_dir)
    r = apply_time(c, lambda s: np.cumsum(np.nan_to_num(s, nan=0.0), axis=1) + s * 0.0,
                   names=["v_csum"])
    return r.cells().select("it", "iy", "ix", "band", "value")


def _q_knn_tiles(spark, sf_dir):
    """Exact kNN tile lookup, DuckDB-oracled: tile rectangles derive from
    `part` (unit tiles on a 40x40 grid, centers at half-integers — exactly
    representable doubles, and provably outside the ring-search boundary so
    the completeness check never ties), query points from `customer`. The
    ring equi-join result equals brute force; the oracle IS brute force."""
    from gdalcubes_spark.pipeline.knn import knn_tiles
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    imgs = part.select(
        F.col("p_partkey").alias("image_id"),
        (F.col("p_partkey") % 40).cast("double").alias("left"),
        ((F.col("p_partkey") % 40) + 1).cast("double").alias("right"),
        F.expr("CAST((p_partkey DIV 40) % 40 AS DOUBLE)").alias("bottom"),
        F.expr("CAST((p_partkey DIV 40) % 40 + 1 AS DOUBLE)").alias("top"))
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter("c_custkey % 25 = 0")
    pts = cust.select(
        F.col("c_custkey").alias("qid"),
        ((F.col("c_custkey") % 390) / F.lit(10.0) + F.lit(0.05)).alias("x"),
        (((F.col("c_custkey") * 13) % 390) / F.lit(10.0) + F.lit(0.05)).alias("y"))
    return knn_tiles(imgs, pts, k=3, cell=1.0)


def _q_multimodal_features(spark, sf_dir):
    """rows-only: binary decode isn't SQL-expressible; pytest oracles pixels."""
    from gdalcubes_spark.pipeline.multimodal import decode_features
    from gdalcubes_spark.synth import ImageLayout, generate_images
    lay = ImageLayout(gx=4, gy=4, ntime=2, tile_w=32, tile_h=32, nb=3,
                      fmts=("png", "raw", "jpeg", "webp"))
    imgs = generate_images(spark, 48, lay)
    f = decode_features(imgs, resize=(8, 8))
    return f.select("image_id", "nb", "h", "w", "ahash")


def _q_multimodal_raw_oracle(spark, sf_dir):
    """FULL DuckDB oracle for the multimodal feature path (r4 VERDICT item
    4, the scan_raw_oracle pattern): a raw-format inventory whose pixels are
    the closed-form synth formula v=(a·px+b·py+17·band+d) mod 256 runs the
    REAL Arrow-batched decode_features (decode → nearest-resize thumbnail →
    band means/stds → aHash) and quality_pool_probe (2×2 block-mean degrade
    → per-band MSE/PSNR); the oracle reconstructs every pixel in pure SQL
    and recomputes all six feature columns, so the decode→resize→feature→
    quality math is value-hash-gated end-to-end. Arithmetic is knife-edge
    free: 32×32 images make every mean a power-of-two division (exact in
    float64), stds stay exact through the algebraic identity, SQRT is
    IEEE-correctly-rounded in both engines, and the aHash two's-complement
    fold is reproduced bit-for-bit with a signed SUM."""
    from gdalcubes_spark.pipeline.multimodal import decode_features, quality_pool_probe
    from gdalcubes_spark.synth import ImageLayout, generate_images
    lay = ImageLayout(gx=4, gy=4, ntime=2, tile_w=32, tile_h=32, nb=2, fmts=("raw",))
    imgs = generate_images(_utc(spark), 48, lay)
    feats = decode_features(imgs, resize=(4, 4))
    per_band = (feats.select(
        "image_id", "h", "w", "ahash", "thumb",
        F.posexplode(F.arrays_zip("band_means", "band_stds")).alias("band", "z"))
        .select("image_id", "band", "h", "w", "ahash",
                F.col("z.band_means").alias("band_mean"),
                F.round(F.col("z.band_stds"), 6).alias("band_std"),
                F.md5(F.concat_ws(",", F.expr(
                    "transform(slice(thumb, band * 16 + 1, 16), x -> cast(cast(x as int) as string))"
                ))).alias("thumb_md5")))
    qual = quality_pool_probe(imgs, factor=2)
    return (per_band.join(qual, ["image_id", "band"])
            .select("image_id", "band", "h", "w", "band_mean", "band_std",
                    "thumb_md5", "ahash", "mse", "psnr"))


def _q_phash_neardup_md5(spark, sf_dir):
    """Fully-oracled Hamming near-dup over an int64 signature column: 60-bit
    md5 'phash' values derived from doc_id (identical in DuckDB), clones
    planted by XOR-ing ≤2 bits. The banded-bucket join + pigeonhole guarantee
    is hash-checked against a DuckDB all-pairs bit_count(xor) scan."""
    from gdalcubes_spark.pipeline.dedup import hash_near_pairs
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id").filter("doc_id < 400")
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast("long")
    base = d.select(F.col("doc_id").alias("id"), h.alias("phash"))
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(id % 57 AS INT)) | "
                  "shiftleft(CAST(1 AS BIGINT), CAST((id * 7) % 57 AS INT))")
    clones = base.filter("id % 3 = 0").select(
        (F.col("id") + 500000).alias("id"),
        F.col("phash").bitwiseXOR(mask).alias("phash"))
    return (hash_near_pairs(base.unionByName(clones), "id", "phash", max_hamming=4)
            .select("ida", "idb", F.col("hamming").cast("int").alias("hamming")))


def _q_seq_pack_stats(spark, sf_dir):
    """SQL-checkable invariants of the FFD packing (bin CONTENTS are
    algorithmic, but per-bucket token sums and the packing guarantees are
    not): bucket_tokens must equal the raw per-bucket sums, and the three
    booleans — every bin within capacity, at most one ≤half-full bin per
    bucket (the first-fit property), bins ≥ ceil(tokens/cap) — must all be
    TRUE, which is exactly what the oracle row asserts."""
    from gdalcubes_spark.pipeline.seqpack import pack_sequences
    max_len = 512
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    packed = pack_sequences(d, max_len=max_len, len_col="n_chars", n_buckets=16)
    capped = F.least(F.col("n_tokens"), F.lit(max_len))
    bins = packed.groupBy("bucket", "bin").agg(F.sum(capped).alias("fill"))
    per_bucket = bins.groupBy("bucket").agg(
        F.count("*").alias("bins_used"),
        F.max("fill").alias("max_fill"),
        F.sum(F.when(F.col("fill") * 2 <= max_len, 1).otherwise(0)).alias("n_half"),
        F.sum("fill").alias("btok"))
    return (per_bucket.select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("btok").cast("long").alias("bucket_tokens"),
        (F.col("max_fill") <= max_len).alias("within_cap"),
        (F.col("n_half") <= 1).alias("halffull_ok"),
        (F.col("bins_used") >= F.ceil(F.col("btok") / max_len)).alias("bins_ge_lb")))


def _q_image_quality(spark, sf_dir):
    """rows-only: recompression quality probe (PSNR + uniform-window SSIM
    vs a real JPEG round trip) — the over-compressed-source curation filter;
    pytest oracles the SSIM math (identity == 1, monotone under noise)."""
    from gdalcubes_spark.pipeline.multimodal import image_quality
    from gdalcubes_spark.synth import ImageLayout, generate_images
    lay = ImageLayout(gx=4, gy=4, ntime=2, tile_w=32, tile_h=32, nb=2,
                      fmts=("png", "raw", "tif"))
    return image_quality(generate_images(_utc(spark), 48, lay), quality=35)


def _q_events_asof(spark, sf_dir):
    """AS-OF join (an operator Spark lacks as a primitive): every 'click'
    event attached to the user's latest prior-or-equal per-minute 'view'
    aggregate. Spark side = union-window form (ONE shuffle on the key);
    oracle = DuckDB's NATIVE ASOF JOIN — two independent constructions."""
    from gdalcubes_spark.pipeline.joins import asof_join
    ev = _utc(spark).read.parquet(f"{sf_dir}/events.parquet")
    clicks = (ev.filter(F.col("event_type") == "click")
              .select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")))
    views = (ev.filter(F.col("event_type") == "view")
             .groupBy("user_id", F.date_trunc("minute", F.col("ts").cast("timestamp")).alias("ts"))
             .agg(F.count("*").alias("n_views"), F.round(F.sum("value"), 6).alias("view_value")))
    out = asof_join(clicks, views, on="user_id", ts="ts")
    # clicks with no prior view keep 0s (NULL-free output: NaN==NaN is false
    # in float comparators, so value-hash gates want concrete sentinels)
    return out.select("event_id", "user_id",
                      F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
                      F.coalesce(F.col("n_views_r"), F.lit(0)).alias("n_views"),
                      F.coalesce(F.col("view_value_r"), F.lit(0.0)).alias("view_value"))


def _q_events_sessions(spark, sf_dir):
    """SESSION windows (30-min inactivity gap) per user — the third
    windowing semantic (after tumbling/sliding): gap-merged event ranges,
    session end = last event + gap. Oracled via lag/cumsum sessionization."""
    ev = _utc(spark).read.parquet(f"{sf_dir}/events.parquet")
    return (ev.groupBy(F.session_window(F.col("ts").cast("timestamp"), "30 minutes").alias("w"),
                       "user_id")
            .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
            .select("user_id",
                    F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
                    F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
                    "n_events", "sum_value"))


def _q_scan_monthly_median(spark, sf_dir):
    """Image-table scan flagship (no SQL oracle — binary decode): synthetic
    image inventory → raster_cube(median) → NDVI-ish expr → reduce_time."""
    from gdalcubes_spark.grid import ChunkGrid, CubeView
    from gdalcubes_spark.sources.raster_cube import raster_cube
    from gdalcubes_spark.synth import ImageLayout, band_names, generate_images

    lay = ImageLayout(left0=0.0, top0=4.0, tile_dx=2.0, tile_dy=2.0, gx=2, gy=2,
                      ntime=4, tile_w=32, tile_h=32, nb=2, fmts=("png", "raw", "jpeg"),
                      hot_every=7, overlap=0.25)
    imgs = generate_images(_utc(spark), 64, lay)
    v = CubeView.create(srs="EPSG:4326", left=0, right=4, bottom=0, top=4,
                        t0="2021-01-01", t1="2021-01-04", dt="P1D", dx=0.125, dy=0.125,
                        aggregation="median", resampling="near")
    c = raster_cube(imgs, v, band_names(lay),
                    chunking=ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=16, cx=16), salt=0)
    ndvi = c.apply_pixel("(b02 - b01) / (b02 + b01 + 1)", ["ndvi"])
    return ndvi.reduce_time("median(ndvi)").cells().select("iy", "ix", "value")


def _q_scan_from_table(spark, sf_dir):
    """rows-only: input-hint-faithful scan — the inventory is READ FROM
    STORAGE (parquet stand-in for the Iceberg table), then equi-joined to
    chunks, decoded and aggregated. Binary decode → no SQL oracle; pytest
    covers the scan per-cell (test_scan.py) and the storage path
    (test_plans.py PartitionFilters)."""
    import tempfile

    from gdalcubes_spark.grid import ChunkGrid, CubeView
    from gdalcubes_spark.sources.raster_cube import raster_cube
    from gdalcubes_spark.synth import ImageLayout, band_names, generate_images

    lay = ImageLayout(left0=0.0, top0=4.0, tile_dx=2.0, tile_dy=2.0, gx=2, gy=2,
                      ntime=4, tile_w=32, tile_h=32, nb=2, fmts=("png", "raw"),
                      hot_every=7, overlap=0.25)
    path = tempfile.mkdtemp(prefix="entry_inventory_") + "/images"
    generate_images(_utc(spark), 64, lay).write.mode("overwrite").parquet(path)
    imgs = spark.read.parquet(path)
    v = CubeView.create(srs="EPSG:4326", left=0, right=4, bottom=0, top=4,
                        t0="2021-01-01", t1="2021-01-04", dt="P1D", dx=0.125, dy=0.125,
                        aggregation="mean", resampling="near")
    c = raster_cube(imgs, v, band_names(lay),
                    chunking=ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=16, cx=16))
    return c.reduce_time("mean(B01)", "mean(B02)").cells().select("iy", "ix", "band", "value")


def _q_scan_geotiff(spark, sf_dir):
    """rows-only: scan over an inventory of REAL GeoTIFF payloads (tiled
    Deflate TIFF 6.0 bytes from the in-repo tiffcodec) — binary decode so no
    SQL oracle; tests/test_scan.py proves per-cell exactness (lossless) and
    tests/test_tiffcodec.py proves the format itself roundtrips + COG layout."""
    from gdalcubes_spark.grid import ChunkGrid, CubeView
    from gdalcubes_spark.sources.raster_cube import raster_cube
    from gdalcubes_spark.synth import ImageLayout, band_names, generate_images

    lay = ImageLayout(left0=0.0, top0=4.0, tile_dx=2.0, tile_dy=2.0, gx=2, gy=2,
                      ntime=4, tile_w=32, tile_h=32, nb=2, fmts=("tif",),
                      hot_every=7, overlap=0.25)
    imgs = generate_images(_utc(spark), 64, lay)
    v = CubeView.create(srs="EPSG:4326", left=0, right=4, bottom=0, top=4,
                        t0="2021-01-01", t1="2021-01-04", dt="P1D", dx=0.125, dy=0.125,
                        aggregation="mean", resampling="near")
    c = raster_cube(imgs, v, band_names(lay),
                    chunking=ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=16, cx=16))
    return c.reduce_time("mean(B01)", "max(B02)").cells().select("iy", "ix", "band", "value")


def _q_scan_webmercator(spark, sf_dir):
    """rows-only: cube VIEW in EPSG:3857 (the web-tile CRS) over 4326
    scenes — the reprojection scan path; exact numpy oracle in
    tests/test_mixed_srs.py."""
    from gdalcubes_spark import srs as _srs
    from gdalcubes_spark.grid import ChunkGrid, CubeView
    from gdalcubes_spark.sources.raster_cube import raster_cube
    from gdalcubes_spark.synth import ImageLayout, band_names, generate_images

    lay = ImageLayout(left0=0.0, top0=4.0, tile_dx=2.0, tile_dy=2.0, gx=2, gy=2,
                      ntime=2, tile_w=32, tile_h=32, nb=1, fmts=("png",))
    imgs = generate_images(_utc(spark), 8, lay)
    l, b = _srs.geodetic_to_webmercator(0.0, 0.0)
    r, t = _srs.geodetic_to_webmercator(4.0, 4.0)
    v = CubeView.create(srs="EPSG:3857", left=float(l), right=float(r),
                        bottom=float(b), top=float(t),
                        t0="2021-01-01", t1="2021-01-02", dt="P1D",
                        nx=32, ny=32, aggregation="mean", resampling="bilinear")
    c = raster_cube(imgs, v, band_names(lay),
                    chunking=ChunkGrid(nt=v.nt, ny=32, nx=32, ct=1, cy=16, cx=16))
    return c.reduce_time("mean(B01)").cells().select("iy", "ix", "value")


def _q_scan_resample_average(spark, sf_dir):
    """rows-only: footprint resampling (gdalwarp 'average') in the
    distributed scan — 32-px tiles down-sampled 4× into the view, so every
    cube cell is the EXACT mean of a 4×4 source block (oracle in
    tests/test_resampling.py)."""
    from gdalcubes_spark.grid import ChunkGrid, CubeView
    from gdalcubes_spark.sources.raster_cube import raster_cube
    from gdalcubes_spark.synth import ImageLayout, band_names, generate_images

    lay = ImageLayout(left0=0.0, top0=4.0, tile_dx=2.0, tile_dy=2.0, gx=2, gy=2,
                      ntime=2, tile_w=32, tile_h=32, nb=1, fmts=("raw",))
    imgs = generate_images(_utc(spark), 8, lay)
    v = CubeView.create(srs="EPSG:4326", left=0, right=4, bottom=0, top=4,
                        t0="2021-01-01", t1="2021-01-02", dt="P1D", dx=0.25, dy=0.25,
                        aggregation="first", resampling="average")
    c = raster_cube(imgs, v, band_names(lay),
                    chunking=ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=8, cx=8))
    return c.cells().select("it", "iy", "ix", "value")


def _q_scan_raw_oracle(spark, sf_dir):
    """The flagship image-scan path with a FULL DuckDB oracle (r3 VERDICT
    item 2): raw-format inventory whose pixels are the closed-form synth
    formula v=(a·px+b·py+17·band+d) mod 256, run through the REAL distributed
    scan — bbox→chunk range join, binary decode, nearest resample, per-cell
    MEAN over overlapping images (hot_every=7 pins a skew cluster onto tile
    (0,0,0)) — then reduce_time(max/min). The oracle reconstructs every pixel
    from the same formula in pure SQL (range() joins), so chunk assignment,
    decode, aggregation and reduction are all value-hash-gated. Geometry is
    knife-edge-free: pdx=dx=2^-4 exactly, cell centers at half-pixels; mean =
    exact-int-sum/count, identical to AVG in float64; max/min order-free."""
    from gdalcubes_spark.grid import ChunkGrid, CubeView
    from gdalcubes_spark.sources.raster_cube import raster_cube
    from gdalcubes_spark.synth import ImageLayout, band_names, generate_images

    lay = ImageLayout(left0=0.0, top0=4.0, tile_dx=2.0, tile_dy=2.0, gx=2, gy=2,
                      ntime=4, tile_w=32, tile_h=32, nb=2, fmts=("raw",), hot_every=7)
    imgs = generate_images(_utc(spark), 64, lay)
    v = CubeView.create(srs="EPSG:4326", left=0, right=4, bottom=0, top=4,
                        t0="2021-01-01", t1="2021-01-04", dt="P1D", dx=0.0625, dy=0.0625,
                        aggregation="mean", resampling="near")
    c = raster_cube(imgs, v, band_names(lay),
                    chunking=ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=32, cx=32))
    r = c.reduce_time("max(B01)", "min(B02)")
    return r.cells().select("iy", "ix", "band", "value")


_SCAN_RAW_ORACLE_SQL = """
    WITH imgs AS (
      SELECT i,
             CASE WHEN i % 7 = 0 THEN 0 ELSE i % 2 END AS tx,
             CASE WHEN i % 7 = 0 THEN 0 ELSE (i // 2) % 2 END AS ty,
             CASE WHEN i % 7 = 0 THEN 0 ELSE (i // 4) % 4 END AS tt,
             1 + (i * 7) % 5 AS a, 1 + (i * 11) % 5 AS b, (i * 13) % 256 AS d
      FROM range(64) t(i)
    ),
    px AS (
      SELECT tt AS it, 32 * ty + py AS iy, 32 * tx + px AS ix, ib,
             CAST((a * px + b * py + 17 * ib + d) % 256 AS DOUBLE) AS v
      FROM imgs
      CROSS JOIN range(32) yy(py) CROSS JOIN range(32) xx(px) CROSS JOIN range(2) bb(ib)
    ),
    agg AS (
      SELECT it, iy, ix, ib, AVG(v) AS value FROM px GROUP BY 1, 2, 3, 4
    )
    SELECT CAST(iy AS INTEGER) AS iy, CAST(ix AS INTEGER) AS ix,
           'B01_max' AS band, MAX(value) AS value
    FROM agg WHERE ib = 0 GROUP BY iy, ix
    UNION ALL
    SELECT CAST(iy AS INTEGER), CAST(ix AS INTEGER), 'B02_min', MIN(value)
    FROM agg WHERE ib = 1 GROUP BY iy, ix
"""


def _q_codec_gif_oracle(spark, sf_dir):
    """REAL GIF entropy decode value-hash-gated end-to-end (the
    scan_raw_oracle pattern applied to the r5 gif codec): a deterministic
    animated-GIF inventory whose frame pixels are the closed-form formula
    v=(a·px+b·py+d) mod 256 (grey → exact 256-entry palette → LZW is
    LOSSLESS), decoded by sample_animation_frames through the full
    gifcodec path — LZW width schedule, palette, GCE delays, compositing.
    The oracle reconstructs frame means and the delay timeline in pure
    SQL, so any bit-level decode defect breaks the value hash."""
    import pandas as pd

    from gdalcubes_spark.pipeline.multimodal import sample_animation_frames

    n_imgs, n_frames, side = 24, 4, 16

    def gen(batches):
        import numpy as np

        from gdalcubes_spark.gifcodec import encode_gif_animation
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                frames = []
                for j in range(n_frames):
                    a, b = 1 + (i * 7 + j) % 5, 1 + (i * 11 + j) % 5
                    d = (i * 13 + j * 29) % 256
                    xx = np.arange(side)[None, :]
                    yy = np.arange(side)[:, None]
                    img = ((a * xx + b * yy + d) % 256).astype(np.uint8)
                    frames.append((img[None], (j + 1) * 5))  # delay cs
                rows.append(dict(image_id=f"gif_{i:04d}",
                                 bytes=encode_gif_animation(frames),
                                 fmt="gif"))
            yield (pd.DataFrame(rows,
                                columns=["image_id", "bytes", "fmt"])
                   if rows else pd.DataFrame(
                       {c: pd.Series(dtype="object")
                        for c in ["image_id", "bytes", "fmt"]}))

    schema = "image_id string, bytes binary, fmt string"
    inv = spark.range(0, n_imgs, numPartitions=8).mapInPandas(gen, schema)
    out = sample_animation_frames(inv, every_n=1)
    return out.select("image_id", "frame_idx", "t_ms", "n_frames",
                      F.round("frame_mean", 6).alias("frame_mean"))


_CODEC_GIF_ORACLE_SQL = """
    WITH f AS (
      SELECT i, j,
             1 + (i * 7 + j) % 5 AS a, 1 + (i * 11 + j) % 5 AS b,
             (i * 13 + j * 29) % 256 AS d
      FROM range(24) t(i) CROSS JOIN range(4) u(j)
    ),
    px AS (
      SELECT i, j, CAST((a * x + b * y + d) % 256 AS DOUBLE) AS v
      FROM f CROSS JOIN range(16) xs(x) CROSS JOIN range(16) ys(y)
    )
    SELECT printf('gif_%04d', CAST(i AS INTEGER)) AS image_id,
           CAST(j AS INTEGER) AS frame_idx,
           CAST(25 * j * (j + 1) AS INTEGER) AS t_ms,
           4 AS n_frames,
           ROUND(AVG(v), 6) AS frame_mean
    FROM px GROUP BY i, j
"""


def _q_audio_meta_oracle(spark, sf_dir):
    """MP3 frame-walk metadata value-hash-gated: crafted CBR streams
    (one bitrate per clip, MPEG-1 Layer III 44.1 kHz) built executor-side
    from raw header math; audio_info must recover frame count, exact
    duration and container bitrate — all reconstructible in closed-form
    SQL from the same (kbps, n_frames) parameters."""
    import pandas as pd

    from gdalcubes_spark.pipeline.multimodal import audio_info

    kbps_tbl = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                256, 320)

    def gen(batches):
        import struct as st
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                kbps = kbps_tbl[i % len(kbps_tbl)]
                nfr = 8 + (i * 3) % 17
                br_idx = kbps_tbl.index(kbps) + 1
                h = (0xFFE00000 | (3 << 19) | (1 << 17) | (1 << 16)
                     | (br_idx << 12) | (0 << 10) | (3 << 6))
                flen = 1152 // 8 * kbps * 1000 // 44100
                frame = (st.pack(">I", h) + bytes(flen))[:flen]
                rows.append(dict(clip_id=f"clip_{i:04d}",
                                 bytes=frame * nfr))
            yield (pd.DataFrame(rows, columns=["clip_id", "bytes"])
                   if rows else pd.DataFrame(
                       {c: pd.Series(dtype="object")
                        for c in ["clip_id", "bytes"]}))

    inv = spark.range(0, 32, numPartitions=8).mapInPandas(
        gen, "clip_id string, bytes binary")
    out = audio_info(inv)
    return out.select("clip_id", "container", "sample_rate", "channels",
                      "n_frames",
                      F.round("duration_s", 6).alias("duration_s"),
                      F.round("bitrate_kbps", 6).alias("bitrate_kbps"))


_AUDIO_META_ORACLE_SQL = """
    WITH params AS (
      SELECT i,
             ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])
               [1 + CAST(i % 14 AS INTEGER)] AS kbps,
             8 + (i * 3) % 17 AS nfr
      FROM range(32) t(i)
    )
    SELECT printf('clip_%04d', CAST(i AS INTEGER)) AS clip_id,
           'mp3(v1L3)' AS container,
           44100 AS sample_rate, 1 AS channels,
           CAST(nfr AS INTEGER) AS n_frames,
           ROUND(nfr * 1152.0 / 44100, 6) AS duration_s,
           ROUND((nfr * ((1152 // 8) * kbps * 1000 // 44100)) * 8.0
                 / (nfr * 1152.0 / 44100) / 1000, 6) AS bitrate_kbps
    FROM params
"""


def _q_video_keyframe_oracle(spark, sf_dir):
    """ISO-BMFF demux value-hash-gated end-to-end: deterministic minimal
    MP4s (ftyp+mdat+moov with varying stsc runs, stss keyframe marks and
    per-sample stsz sizes) built executor-side from closed-form parameters;
    video_keyframe_index must expand stsc x stco x stsz x stts x stss into
    the exact byte-range plan — offsets/timestamps/sizes all reconstructible
    in pure SQL (window cumsum over the size formula).  Covers the round-5
    mp4meta module (reference analogue: planning which byte ranges a
    distributed extractor reads, image_collection_cube.cpp's GDAL window
    reads)."""
    import pandas as pd

    from gdalcubes_spark.pipeline.multimodal import video_keyframe_index

    def gen(batches):
        import struct as st

        def box(typ, payload):
            return st.pack(">I", 8 + len(payload)) + typ + payload

        def full(typ, payload):
            return box(typ, b"\x00\x00\x00\x00" + payload)

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                n = 8 + (i * 5) % 12
                delta = 10 + (i % 5) * 2
                spc = 1 + i % 4
                sizes = [50 + ((i * 7 + j * 13) % 40) for j in range(n)]
                keys = [j + 1 for j in range(n) if j % 3 == 0]
                ftyp = box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
                mdat = box(b"mdat", b"".join(bytes([s % 251]) * s
                                             for s in sizes))
                pos, chunk_offs = len(ftyp) + 8, []
                for j, s in enumerate(sizes):
                    if j % spc == 0:
                        chunk_offs.append(pos)
                    pos += s
                dur = n * delta
                mvhd = full(b"mvhd", st.pack(">II", 0, 0)
                            + st.pack(">II", 600, dur) + bytes(80))
                tkhd = full(b"tkhd", st.pack(">II", 0, 0)
                            + st.pack(">I", 7) + bytes(4)
                            + st.pack(">I", dur) + bytes(52)
                            + st.pack(">II", 64 << 16, 48 << 16))
                mdhd = full(b"mdhd", st.pack(">II", 0, 0)
                            + st.pack(">II", 600, dur) + bytes(4))
                hdlr = full(b"hdlr", bytes(4) + b"vide" + bytes(12) + b"v\x00")
                entry = box(b"avc1", bytes(6) + st.pack(">H", 1) + bytes(16)
                            + st.pack(">HH", 64, 48) + bytes(50))
                stbl = box(b"stbl",
                           full(b"stsd", st.pack(">I", 1) + entry)
                           + full(b"stts", st.pack(">III", 1, n, delta))
                           + full(b"stss", st.pack(">I", len(keys))
                                  + b"".join(st.pack(">I", k) for k in keys))
                           + full(b"stsz", st.pack(">II", 0, n)
                                  + b"".join(st.pack(">I", s) for s in sizes))
                           + full(b"stsc", st.pack(">I", 1)
                                  + st.pack(">III", 1, spc, 1))
                           + full(b"stco", st.pack(">I", len(chunk_offs))
                                  + b"".join(st.pack(">I", o)
                                             for o in chunk_offs)))
                moov = box(b"moov", mvhd + box(b"trak", tkhd + box(
                    b"mdia", mdhd + hdlr + box(b"minf", stbl))))
                rows.append(dict(video_id=f"vid_{i:04d}",
                                 bytes=ftyp + mdat + moov))
            yield (pd.DataFrame(rows, columns=["video_id", "bytes"])
                   if rows else pd.DataFrame(
                       {c: pd.Series(dtype="object")
                        for c in ["video_id", "bytes"]}))

    inv = spark.range(0, 24, numPartitions=8).mapInPandas(
        gen, "video_id string, bytes binary")
    out = video_keyframe_index(inv)
    return out.select("video_id", "sample_idx",
                      F.round("t_s", 6).alias("t_s"), "offset", "size_bytes")


_VIDEO_KEYFRAME_ORACLE_SQL = """
    WITH p AS (
      SELECT i, 8 + (i * 5) % 12 AS n, 10 + (i % 5) * 2 AS delta
      FROM range(24) t(i)
    ),
    s AS (
      SELECT i, j, delta, 50 + ((i * 7 + j * 13) % 40) AS sz
      FROM p CROSS JOIN range(20) u(j) WHERE j < n
    ),
    c AS (
      SELECT i, j, delta, sz,
             32 + COALESCE(SUM(sz) OVER (
               PARTITION BY i ORDER BY j
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
      FROM s
    )
    SELECT printf('vid_%04d', CAST(i AS INTEGER)) AS video_id,
           CAST(j AS INTEGER) AS sample_idx,
           ROUND(j * delta / 600.0, 6) AS t_s,
           CAST(off AS BIGINT) AS offset,
           CAST(sz AS BIGINT) AS size_bytes
    FROM c WHERE j % 3 = 0
"""


def _q_media_meta_oracle(spark, sf_dir):
    """The three crafted-media oracles (REAL GIF entropy decode, MP3 frame
    walk, ISO-BMFF keyframe plan) unioned onto one (media_id, kind, idx, t,
    v1, v2) schema — ONE driver-gate row so the oracled set stays inside
    the driver's query budget while still value-hash-gating all three
    codec/metadata paths."""
    g = _q_codec_gif_oracle(spark, sf_dir).select(
        F.col("image_id").alias("media_id"),
        F.lit("gif_frame").alias("kind"),
        F.col("frame_idx").alias("idx"),
        F.col("t_ms").cast("double").alias("t"),
        F.col("frame_mean").alias("v1"),
        F.col("n_frames").cast("double").alias("v2"))
    a = _q_audio_meta_oracle(spark, sf_dir).select(
        F.col("clip_id").alias("media_id"),
        F.lit("mp3").alias("kind"),
        F.col("n_frames").alias("idx"),
        F.col("duration_s").alias("t"),
        F.col("bitrate_kbps").alias("v1"),
        F.col("sample_rate").cast("double").alias("v2"))
    v = _q_video_keyframe_oracle(spark, sf_dir).select(
        F.col("video_id").alias("media_id"),
        F.lit("mp4_key").alias("kind"),
        F.col("sample_idx").alias("idx"),
        F.col("t_s").alias("t"),
        F.col("offset").cast("double").alias("v1"),
        F.col("size_bytes").cast("double").alias("v2"))
    return g.unionAll(a).unionAll(v)


_MEDIA_META_ORACLE_SQL = f"""
    SELECT image_id AS media_id, 'gif_frame' AS kind, frame_idx AS idx,
           CAST(t_ms AS DOUBLE) AS t, frame_mean AS v1,
           CAST(n_frames AS DOUBLE) AS v2
    FROM ({_CODEC_GIF_ORACLE_SQL})
    UNION ALL
    SELECT clip_id, 'mp3', n_frames, duration_s, bitrate_kbps,
           CAST(sample_rate AS DOUBLE)
    FROM ({_AUDIO_META_ORACLE_SQL})
    UNION ALL
    SELECT video_id, 'mp4_key', sample_idx, t_s, CAST("offset" AS DOUBLE),
           CAST(size_bytes AS DOUBLE)
    FROM ({_VIDEO_KEYFRAME_ORACLE_SQL})
"""


def _q_events_windows(spark, sf_dir):
    """Tumbling (1 h) and sliding (1 h / 15 min — each event in 4 windows)
    event aggregation in one driver row, distinguished by `kind`; the two
    streaming windowing semantics of gdalcubes_spark.streaming."""
    ev = _utc(spark).read.parquet(f"{sf_dir}/events.parquet")

    def agg(kind, *win):
        return (ev.groupBy(
                    F.window(F.col("ts").cast("timestamp"), *win).alias("w"),
                    "event_type")
                .agg(F.count("*").alias("n"),
                     F.round(F.sum("value"), 6).alias("sum_value"))
                .select(F.lit(kind).alias("kind"),
                        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                         .alias("window_start"),
                        "event_type", "n", "sum_value"))

    return agg("tumbling", "1 hour").unionAll(
        agg("sliding", "1 hour", "15 minutes"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """ALL DuckDB-oracled queries first, rows-only last: the driver runs the
    dict in order under a budget, and an oracled query it never reaches has
    no green CORRECTNESS row (the r3 gap). Redundant rows-only twins of
    oracled queries (xxhash simhash/phash, raw seq_pack) live in pytest only
    (tests/test_pipeline.py, tests/test_training_ops.py)."""
    return {
        # ---- DuckDB-oracled (rows + schema + value-hash gate) ----
        "cube_reduce_time": _q_reduce_time,
        "cube_reduce_quantiles": _q_reduce_quantiles,
        "cube_reduce_space": _q_reduce_space,
        "cube_apply_pixel": _q_apply_pixel,
        "cube_filter_pixel": _q_filter_pixel,
        "cube_crop": _q_crop,
        "cube_slice_time": _q_slice_time,
        "cube_slice_space": _q_slice_space,
        "cube_select_time": _q_select_time,
        "cube_histogram": _q_cube_histogram,
        "cube_zonal_stats": _q_zonal_stats,
        "cube_filter_geom": _q_filter_geom,
        "cube_aggregate_time": _q_aggregate_time,
        "cube_aggregate_space": _q_aggregate_space,
        "cube_window_time": _q_window_time,
        "cube_window_space": _q_window_space,
        "cube_fill_time": _q_fill_time,
        "cube_reduce_counts": _q_reduce_counts,
        "cube_join_bands": _q_join_bands,
        "cube_apply_time_cumsum": _q_apply_time_cumsum,
        "scan_raw_oracle": _q_scan_raw_oracle,
        "media_meta_oracle": _q_media_meta_oracle,
        "text_stats": _q_text_stats,
        "text_tokens": _q_text_tokens,
        "text_tfidf": _q_text_tfidf,
        "text_winnow": _q_text_winnow,
        "text_ngrams": _q_text_ngrams,
        "text_quality_by_source": _q_text_quality_by_source,
        "text_decontaminate": _q_text_decontaminate,
        "text_pii_scan": _q_text_pii_scan,
        "dedup_exact": _q_dedup_exact,
        "dedup_jaccard": _q_dedup_jaccard,
        "dedup_minhash_lsh": _q_dedup_minhash_lsh,
        "dedup_simhash_md5": _q_dedup_simhash_md5,
        "dedup_clusters": _q_dedup_clusters,
        "phash_neardup_md5": _q_phash_neardup_md5,
        "sample_det": _q_sample_det,
        "sample_stratified": _q_sample_stratified,
        "sample_mixture": _q_sample_mixture,
        "curriculum_shards": _q_curriculum,
        "seq_pack_stats": _q_seq_pack_stats,
        "ann_topk": _q_ann_topk,
        "ann_recall_gate": _q_ann_recall_gate,
        "multimodal_raw_oracle": _q_multimodal_raw_oracle,
        "embed_neardup": _q_embed_neardup,
        "semantic_dedup": _q_semantic_dedup,
        "knn_tiles": _q_knn_tiles,
        "events_windows": _q_events_windows,
        "events_sessions": _q_events_sessions,
        "events_asof": _q_events_asof,
        # ---- rows-only (binary decode / approximate by design; each has a
        #      numpy or brute-force oracle in tests/) ----
        "scan_monthly_median": _q_scan_monthly_median,
        "scan_from_table": _q_scan_from_table,
        "scan_geotiff": _q_scan_geotiff,
        "scan_webmercator": _q_scan_webmercator,
        "scan_resample_average": _q_scan_resample_average,
        "ann_lsh": _q_ann_lsh,
        "ann_ivf": _q_ann_ivf,
        "ann_pq": _q_ann_pq,
        "ann_ivfpq": _q_ann_ivfpq,
        "multimodal_features": _q_multimodal_features,
        "image_quality": _q_image_quality,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "cube_reduce_time": _CELLS_CTE + f"""
            SELECT iy, ix, band || '_mean' AS band, AVG(value) AS value FROM cells GROUP BY iy, ix, cells.band
            UNION ALL
            SELECT iy, ix, band || '_min', MIN(value) FROM cells GROUP BY iy, ix, cells.band
            UNION ALL
            SELECT iy, ix, band || '_max', MAX(value) FROM cells GROUP BY iy, ix, cells.band
            UNION ALL
            SELECT iy, ix, band || '_median', QUANTILE_CONT(value, 0.5) FROM cells GROUP BY iy, ix, cells.band
        """,
        "cube_reduce_quantiles": _CELLS_CTE + """
            SELECT iy, ix, band || '_Q1' AS band, ROUND(QUANTILE_CONT(value, 0.25), 6) AS value
            FROM cells GROUP BY iy, ix, cells.band
            UNION ALL
            SELECT iy, ix, band || '_Q3', ROUND(QUANTILE_CONT(value, 0.75), 6) FROM cells GROUP BY iy, ix, cells.band
            UNION ALL
            SELECT iy, ix, band || '_var', ROUND(VAR_SAMP(value), 6) FROM cells GROUP BY iy, ix, cells.band HAVING COUNT(*) > 1
            UNION ALL
            SELECT iy, ix, band || '_sd', ROUND(STDDEV_SAMP(value), 6) FROM cells GROUP BY iy, ix, cells.band HAVING COUNT(*) > 1
        """,
        "cube_reduce_space": _CELLS_CTE + """
            SELECT it, band || '_mean' AS band, AVG(value) AS value FROM cells GROUP BY it, cells.band
            UNION ALL
            SELECT it, band || '_min', MIN(value) FROM cells GROUP BY it, cells.band
            UNION ALL
            SELECT it, band || '_max', MAX(value) FROM cells GROUP BY it, cells.band
        """,
        "cube_apply_pixel": _CELLS_CTE + """
            SELECT it, iy, ix, 'w' AS band, value * 2 + ix + iy + it AS value FROM cells
        """,
        "cube_filter_pixel": _CELLS_CTE + """
            SELECT it, iy, ix, band, value FROM cells WHERE value % 7 > 3
        """,
        "cube_crop": _CELLS_CTE + """
            SELECT CAST(it - 1 AS INTEGER) AS it, CAST(iy - 5 AS INTEGER) AS iy,
                   CAST(ix - 5 AS INTEGER) AS ix, band, value
            FROM cells
            WHERE ix >= 5 AND ix < 15 AND iy >= 5 AND iy < 15 AND it >= 1 AND it <= 4
        """,
        "cube_slice_time": _CELLS_CTE + """
            SELECT CAST(0 AS INTEGER) AS it, iy, ix, band, value FROM cells WHERE it = 3
        """,
        "cube_slice_space": _CELLS_CTE + """
            SELECT it, CAST(0 AS INTEGER) AS iy, CAST(0 AS INTEGER) AS ix, band, value
            FROM cells WHERE ix = 7 AND iy = 3
        """,
        "cube_select_time": _CELLS_CTE + """
            SELECT CAST(CASE WHEN it = 1 THEN 0 ELSE 1 END AS INTEGER) AS it, iy, ix, band, value
            FROM cells WHERE it IN (1, 4)
        """,
        "cube_zonal_stats": _CELLS_CTE + f"""
            SELECT CAST(fid AS BIGINT) AS fid,
                   STRFTIME(DATE '2021-01-01' + it * INTERVAL 1 DAY, '%Y-%m-%d') AS time,
                   AVG(value) AS v_mean, COUNT(value) AS v_count,
                   MIN(value) AS v_min, MAX(value) AS v_max
            FROM cells, {_RECTS_SQL}
            WHERE (ix + 0.5) > rl AND (ix + 0.5) < rr
              AND ({NY} - iy - 0.5) > rb AND ({NY} - iy - 0.5) < rt
            GROUP BY fid, it
        """,
        "cube_filter_geom": _CELLS_CTE + """
            SELECT CAST(it AS INTEGER) AS it, CAST(iy - 2 AS INTEGER) AS iy,
                   CAST(ix - 2 AS INTEGER) AS ix, band, value
            FROM cells
            WHERE (ix + 0.5) > 2 AND (ix + 0.5) < 18
              AND (20 - iy - 0.5) > 2 AND (20 - iy - 0.5) < 18
              AND NOT ((ix + 0.5) > 8 AND (ix + 0.5) < 12
                       AND (20 - iy - 0.5) > 8 AND (20 - iy - 0.5) < 12)
        """,
        "cube_aggregate_time": _CELLS_CTE + """
            SELECT CAST(it // 2 AS INTEGER) AS it, iy, ix, band, AVG(value) AS value
            FROM cells GROUP BY it // 2, iy, ix, band
        """,
        "cube_aggregate_space": _CELLS_CTE + """
            SELECT it, CAST(iy // 2 AS INTEGER) AS iy, CAST(ix // 2 AS INTEGER) AS ix,
                   band, MAX(value) AS value
            FROM cells GROUP BY it, iy // 2, ix // 2, band
        """,
        # dense grid so the window frame is calendar-true (missing slices count
        # as NULL, matching the cube's NaN cells)
        "cube_window_time": _CELLS_CTE + f"""
            , grid AS (SELECT DISTINCT iy, ix, band FROM cells),
            dense AS (
              SELECT CAST(t.range AS INTEGER) AS it, g.iy, g.ix, g.band, c.value
              FROM grid g CROSS JOIN range({NT}) t
              LEFT JOIN cells c ON c.it = t.range AND c.iy = g.iy AND c.ix = g.ix AND c.band = g.band
            )
            SELECT * FROM (
              SELECT it, iy, ix, band || '_sum' AS band,
                     SUM(value) OVER (PARTITION BY iy, ix, dense.band ORDER BY it
                                      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS value
              FROM dense
            ) WHERE value IS NOT NULL
        """,
        "cube_window_space": _CELLS_CTE + f"""
            SELECT it, CAST(cy AS INTEGER) AS iy, CAST(cx AS INTEGER) AS ix,
                   'v_sum' AS band, SUM(value) AS value
            FROM (SELECT c.it, c.iy + o.dy AS cy, c.ix + o.dx AS cx, c.value
                  FROM cells c CROSS JOIN (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)) o(dy, dx)) s
            WHERE cy >= 0 AND cy < {NY} AND cx >= 0 AND cx < {NX}
            GROUP BY it, cy, cx
        """,
        "cube_fill_time": _CELLS_CTE + f"""
            , grid AS (SELECT DISTINCT iy, ix, band FROM cells),
            dense AS (
              SELECT CAST(t.range AS INTEGER) AS it, g.iy, g.ix, g.band, c.value
              FROM grid g CROSS JOIN range({NT}) t
              LEFT JOIN cells c ON c.it = t.range AND c.iy = g.iy AND c.ix = g.ix AND c.band = g.band
            ),
            ctx AS (
              SELECT it, iy, ix, band, value,
                     LAST_VALUE(value IGNORE NULLS) OVER w_prev AS pv,
                     LAST_VALUE(CASE WHEN value IS NOT NULL THEN it END IGNORE NULLS) OVER w_prev AS pit,
                     FIRST_VALUE(value IGNORE NULLS) OVER w_next AS nv,
                     FIRST_VALUE(CASE WHEN value IS NOT NULL THEN it END IGNORE NULLS) OVER w_next AS nit
              FROM dense
              WINDOW w_prev AS (PARTITION BY iy, ix, band ORDER BY it
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                     w_next AS (PARTITION BY iy, ix, band ORDER BY it
                                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
            )
            SELECT 'locf' AS method, it, iy, ix, band, pv AS value
            FROM ctx WHERE pv IS NOT NULL
            UNION ALL
            SELECT 'linear', it, iy, ix, band, ROUND(value, 6) FROM (
              SELECT it, iy, ix, band,
                     CASE WHEN value IS NOT NULL THEN value
                          WHEN pv IS NULL THEN nv
                          WHEN nv IS NULL THEN pv
                          ELSE pv * (CAST(nit - it AS DOUBLE) / (nit - pit))
                             + nv * (CAST(it - pit AS DOUBLE) / (nit - pit)) END AS value
              FROM ctx
            ) WHERE value IS NOT NULL
            UNION ALL
            SELECT 'near', it, iy, ix, band, value FROM (
              SELECT it, iy, ix, band,
                     CASE WHEN value IS NOT NULL THEN value
                          WHEN pv IS NULL THEN nv
                          WHEN nv IS NULL THEN pv
                          WHEN (it - pit) <= (nit - it) THEN pv ELSE nv END AS value
              FROM ctx
            ) WHERE value IS NOT NULL
        """,
        "cube_reduce_counts": _CELLS_CTE + """
            , p AS (SELECT it, iy, ix, 'p' AS band, value % 7 + 1 AS value FROM cells),
            ext AS (SELECT iy, ix, band, MIN(value) mv, MAX(value) xv FROM p GROUP BY iy, ix, band)
            SELECT iy, ix, band || '_count' AS band, CAST(COUNT(value) AS DOUBLE) AS value FROM p GROUP BY iy, ix, p.band
            UNION ALL
            SELECT iy, ix, band || '_sum', SUM(value) FROM p GROUP BY iy, ix, p.band
            UNION ALL
            SELECT iy, ix, band || '_prod', PRODUCT(value) FROM p GROUP BY iy, ix, p.band
            UNION ALL
            SELECT p.iy, p.ix, p.band || '_which_min',
                   CAST(20210101000000 + 1000000 * MIN(p.it) AS DOUBLE)
            FROM p JOIN ext ON ext.iy = p.iy AND ext.ix = p.ix AND ext.band = p.band
            WHERE p.value = ext.mv GROUP BY p.iy, p.ix, p.band
            UNION ALL
            SELECT p.iy, p.ix, p.band || '_which_max',
                   CAST(20210101000000 + 1000000 * MIN(p.it) AS DOUBLE)
            FROM p JOIN ext ON ext.iy = p.iy AND ext.ix = p.ix AND ext.band = p.band
            WHERE p.value = ext.xv GROUP BY p.iy, p.ix, p.band
        """,
        "cube_join_bands": _CELLS_CTE + f"""
            SELECT it, iy, ix, band, value FROM cells
            UNION ALL
            SELECT CAST(o_orderkey % {NT} AS INTEGER), CAST(o_custkey % {NY} AS INTEGER),
                   CAST(o_orderkey % {NX} AS INTEGER), 'w', CAST(COUNT(*) AS DOUBLE)
            FROM orders GROUP BY 1, 2, 3
        """,
        "text_stats": _text_stats_oracle(),
        "text_tokens": _text_tokens_oracle(),
        "text_tfidf": _text_tfidf_oracle(),
        "text_winnow": _text_winnow_oracle(),
        "dedup_exact": "WITH " + _CLONES_SQL + """
            SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
            FROM docs GROUP BY md5(lower(trim(text)))
        """,
        "dedup_jaccard": "WITH " + _CLONES_SQL + """
            , toks AS (SELECT DISTINCT doc_id, unnest(string_split(lower(text), ' ')) tok FROM docs),
            sizes AS (SELECT doc_id, COUNT(*) sz FROM toks GROUP BY doc_id),
            inter AS (SELECT a.doc_id ida, b.doc_id idb, COUNT(*) i
                      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
            SELECT ida, idb, ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter JOIN sizes sa ON sa.doc_id = ida JOIN sizes sb ON sb.doc_id = idb
            WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
        """,
        # LSH oracle = EXACT shingle Jaccard: at threshold 0.8 the 16×4 banding
        # detects pairs with probability ~0.9986+ and clone pairs are j≈0.95+,
        # so LSH output equals the exact set deterministically on this data
        "dedup_minhash_lsh": "WITH " + _CLONES_SQL + """
            , words AS (SELECT doc_id, string_split(lower(text), ' ') ws FROM docs),
            sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i+1:i+3], ' ') s
                   FROM words CROSS JOIN range(0, 400) t(i) WHERE i <= greatest(len(ws)-3, 0)),
            sizes AS (SELECT doc_id, COUNT(*) sz FROM sh GROUP BY doc_id),
            inter AS (SELECT a.doc_id ida, b.doc_id idb, COUNT(*) i
                      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
            SELECT ida, idb, ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
            FROM inter JOIN sizes sa ON sa.doc_id = ida JOIN sizes sb ON sb.doc_id = idb
            WHERE ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) >= 0.8
        """,
        "events_windows": """
            SELECT 'tumbling' AS kind,
                   STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
                   event_type, COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
            FROM events GROUP BY 2, 3
            UNION ALL
            SELECT 'sliding', window_start, event_type, n, sum_value FROM (
              WITH e AS (
                SELECT event_type, value, epoch(ts) AS es,
                       (CAST(floor(epoch(ts) / 900) AS BIGINT) * 900) AS b
                FROM events
              ),
              x AS (
                SELECT make_timestamp((b - k * 900) * 1000000) AS ws, event_type, value
                FROM e CROSS JOIN (SELECT unnest(range(0, 4)) AS k) t
                WHERE (b - k * 900) <= es AND es < (b - k * 900) + 3600
              )
              SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS window_start, event_type,
                     COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
              FROM x GROUP BY 1, 2
            )
        """,
        "events_asof": """
            WITH clicks AS (
              SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
            ),
            views AS (
              SELECT user_id, DATE_TRUNC('minute', ts) AS ts,
                     COUNT(*) AS n_views, ROUND(SUM(value), 6) AS view_value
              FROM events WHERE event_type = 'view' GROUP BY 1, 2
            )
            SELECT c.event_id, c.user_id,
                   STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
                   COALESCE(v.n_views, 0) AS n_views,
                   COALESCE(v.view_value, 0.0) AS view_value
            FROM clicks c ASOF LEFT JOIN views v
              ON c.user_id = v.user_id AND c.ts >= v.ts
        """,
        "events_sessions": """
            WITH o AS (
              SELECT user_id, ts, value,
                     CASE WHEN LAG(ts) OVER w IS NULL
                          OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS brk
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ),
            s AS (
              SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
              FROM o
            )
            SELECT user_id,
                   STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                   STRFTIME(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
                   COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
            FROM s GROUP BY user_id, sid
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id qid, CAST(embedding AS DOUBLE[]) qv
                       FROM embeddings WHERE vec_id % 100 = 0)
            SELECT qid AS query_id, vec_id AS neighbor_id,
                   ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6) AS sim
            FROM embeddings, q WHERE vec_id <> qid
            QUALIFY row_number() OVER (PARTITION BY qid
                ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) DESC, vec_id) <= 5
        """,
        "ann_recall_gate": """
            WITH q AS (SELECT vec_id qid, CAST(embedding AS DOUBLE[]) qv
                       FROM embeddings WHERE vec_id % 100 = 0),
            topk AS (
              SELECT qid, vec_id,
                     list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) AS sim
              FROM embeddings, q WHERE vec_id <> qid
              QUALIFY row_number() OVER (PARTITION BY qid
                  ORDER BY list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv) DESC,
                           vec_id) <= 5
            ),
            base AS (
              SELECT qid AS query_id,
                     string_agg(CAST(vec_id AS VARCHAR), ',' ORDER BY vec_id) AS brute_ids,
                     ROUND(MIN(sim), 6) AS brute_min_sim
              FROM topk GROUP BY qid
            )
            SELECT m.method, b.query_id, b.brute_ids, b.brute_min_sim,
                   TRUE AS recall_ok
            FROM base b CROSS JOIN (VALUES ('lsh'), ('ivf'), ('pq'), ('ivfpq')) m(method)
        """,
        "multimodal_raw_oracle": """
            WITH imgs AS (
              SELECT i, printf('img_%012d', i) AS image_id,
                     1 + (i * 7) % 5 AS a, 1 + (i * 11) % 5 AS b, (i * 13) % 256 AS d
              FROM range(48) t(i)
            ),
            px AS (
              SELECT image_id, ib AS band, py, px,
                     CAST((a * px + b * py + 17 * ib + d) % 256 AS DOUBLE) AS v
              FROM imgs CROSS JOIN range(2) bb(ib)
                        CROSS JOIN range(32) yy(py) CROSS JOIN range(32) xx(px)
            ),
            stats AS (
              SELECT image_id, band, AVG(v) AS band_mean,
                     ROUND(SQRT(AVG(v * v) - AVG(v) * AVG(v)), 6) AS band_std
              FROM px GROUP BY 1, 2
            ),
            thumb AS (
              SELECT image_id, band,
                     md5(string_agg(CAST(CAST(v AS INTEGER) AS VARCHAR), ','
                                    ORDER BY py, px)) AS thumb_md5
              FROM px WHERE py % 8 = 0 AND px % 8 = 0
              GROUP BY 1, 2
            ),
            g AS (SELECT image_id, py, px, AVG(v) AS gv FROM px GROUP BY 1, 2, 3),
            pooled AS (
              SELECT image_id, py // 4 AS by, px // 4 AS bx, AVG(gv) AS pv
              FROM g GROUP BY 1, 2, 3
            ),
            pm AS (SELECT image_id, AVG(pv) AS pmean FROM pooled GROUP BY 1),
            ah AS (
              SELECT p.image_id, CAST(SUM(
                CASE WHEN p.pv > pm.pmean THEN
                  CASE WHEN 8 * p.by + p.bx = 0 THEN -9223372036854775807 - 1
                       ELSE CAST(1 AS BIGINT) << CAST(63 - (8 * p.by + p.bx) AS INTEGER) END
                ELSE 0 END) AS BIGINT) AS ahash
              FROM pooled p JOIN pm USING (image_id) GROUP BY 1
            ),
            deg AS (
              SELECT image_id, band, py // 2 AS by, px // 2 AS bx, AVG(v) AS dv
              FROM px GROUP BY 1, 2, 3, 4
            ),
            q AS (
              SELECT px.image_id, px.band, AVG((v - dv) * (v - dv)) AS mse
              FROM px JOIN deg ON deg.image_id = px.image_id AND deg.band = px.band
                              AND deg.by = px.py // 2 AND deg.bx = px.px // 2
              GROUP BY 1, 2
            )
            SELECT s.image_id, CAST(s.band AS INTEGER) AS band,
                   32 AS h, 32 AS w, s.band_mean, s.band_std, t.thumb_md5, ah.ahash,
                   q.mse, ROUND(10 * LOG10(65025.0 / q.mse), 6) AS psnr
            FROM stats s
            JOIN thumb t USING (image_id, band)
            JOIN ah USING (image_id)
            JOIN q USING (image_id, band)
        """,
        "embed_neardup": """
            WITH emb AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
              UNION ALL
              SELECT vec_id + 100000, list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2)
              FROM embeddings
            )
            SELECT a.vec_id AS ida, b.vec_id AS idb,
                   ROUND(list_cosine_similarity(a.v, b.v), 6) AS sim
            FROM emb a JOIN emb b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.999
        """,
        "cube_histogram": _CELLS_CTE + """
            SELECT band, bin,
                   ROUND(0.0 + bin * 31.25, 9) AS lo,
                   ROUND(0.0 + (bin + 1) * 31.25, 9) AS hi,
                   COUNT(*) AS n
            FROM (
              SELECT band,
                     LEAST(15, GREATEST(0, CAST(FLOOR((value - 0.0) / 31.25) AS BIGINT))) AS bin
              FROM cells WHERE value IS NOT NULL
            ) GROUP BY band, bin
        """,
        "semantic_dedup": """
            WITH RECURSIVE emb AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
              UNION ALL
              SELECT vec_id + 100000, list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2)
              FROM embeddings
            ),
            pe AS (SELECT a.vec_id a, b.vec_id b
                   FROM emb a JOIN emb b ON a.vec_id < b.vec_id
                   WHERE list_cosine_similarity(a.v, b.v) >= 0.999),
            sym AS (SELECT a, b FROM pe UNION SELECT b, a FROM pe),
            walk(node, reach) AS (
              SELECT vec_id, vec_id FROM emb
              UNION
              SELECT w.node, s.b FROM walk w JOIN sym s ON s.a = w.reach
            ),
            lab AS (SELECT node AS vec_id, MIN(reach) AS cluster FROM walk GROUP BY node),
            sz AS (SELECT cluster, COUNT(*) AS cluster_size FROM lab GROUP BY cluster)
            SELECT l.vec_id, l.cluster, sz.cluster_size, (l.vec_id = l.cluster) AS keep
            FROM lab l JOIN sz USING (cluster)
        """,
        "scan_raw_oracle": _SCAN_RAW_ORACLE_SQL,
        "media_meta_oracle": _MEDIA_META_ORACLE_SQL,
        "cube_apply_time_cumsum": _CELLS_CTE + """
            SELECT it, iy, ix, CAST('v_csum' AS VARCHAR) AS band,
                   SUM(value) OVER (PARTITION BY iy, ix ORDER BY it
                                    ROWS UNBOUNDED PRECEDING) AS value
            FROM cells
        """,
        "sample_det": _sample_det_oracle(),
        "sample_stratified": _sample_strat_oracle(),
        "sample_mixture": _sample_mixture_oracle(),
        "curriculum_shards": _curriculum_oracle(),
        "text_ngrams": _text_ngrams_oracle(),
        "text_quality_by_source": _text_quality_by_source_oracle(),
        "text_decontaminate": _text_decontaminate_oracle(),
        "text_pii_scan": _text_pii_scan_oracle(),
        "dedup_clusters": "WITH RECURSIVE " + _CLONES_SQL + """
            , words AS (SELECT doc_id, string_split(lower(text), ' ') ws FROM docs),
            sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i+1:i+3], ' ') s
                   FROM words CROSS JOIN range(0, 400) t(i) WHERE i <= greatest(len(ws)-3, 0)),
            sizes AS (SELECT doc_id, COUNT(*) sz FROM sh GROUP BY doc_id),
            inter AS (SELECT a.doc_id ida, b.doc_id idb, COUNT(*) i
                      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                      GROUP BY 1, 2),
            pe AS (SELECT ida a, idb b FROM inter
                   JOIN sizes sa ON sa.doc_id = ida JOIN sizes sb ON sb.doc_id = idb
                   WHERE ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) >= 0.8),
            sym AS (SELECT a, b FROM pe UNION SELECT b, a FROM pe),
            walk(node, reach) AS (
              SELECT doc_id, doc_id FROM docs
              UNION
              SELECT w.node, s.b FROM walk w JOIN sym s ON s.a = w.reach
            ),
            lab AS (SELECT node AS doc_id, MIN(reach) AS cluster FROM walk GROUP BY node),
            sz AS (SELECT cluster, COUNT(*) AS cluster_size FROM lab GROUP BY cluster)
            SELECT l.doc_id, l.cluster, sz.cluster_size, (l.doc_id = l.cluster) AS keep
            FROM lab l JOIN sz USING (cluster)
        """,
        "dedup_simhash_md5": "WITH " + _CLONES_SQL + """
            , toks AS (
              SELECT doc_id, unnest(string_split_regex(lower(text), ' +')) AS tok FROM docs
            ), h AS (
              SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS hv
              FROM toks WHERE tok <> ''
            ), bs AS (
              SELECT doc_id, b, SUM(CASE WHEN (hv >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
              FROM h CROSS JOIN (SELECT unnest(range(60)) AS b) GROUP BY doc_id, b
            ), sig AS (
              SELECT doc_id, SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS sh
              FROM bs GROUP BY doc_id
            )
            SELECT a.doc_id AS ida, b.doc_id AS idb,
                   CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
            FROM sig a JOIN sig b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.sh, b.sh)) <= 3
        """,
        "knn_tiles": """
            WITH imgs AS (
              SELECT p_partkey AS image_id,
                     (p_partkey % 40) + 0.5 AS cxm,
                     ((p_partkey // 40) % 40) + 0.5 AS cym
              FROM part
            ), pts AS (
              SELECT c_custkey AS qid,
                     (c_custkey % 390) / 10.0 + 0.05 AS x,
                     ((c_custkey * 13) % 390) / 10.0 + 0.05 AS y
              FROM customer WHERE c_custkey % 25 = 0
            )
            SELECT qid, image_id,
                   ROUND(SQRT((x - cxm) * (x - cxm) + (y - cym) * (y - cym)), 9) AS dist
            FROM pts CROSS JOIN imgs
            QUALIFY row_number() OVER (PARTITION BY qid
                ORDER BY SQRT((x - cxm) * (x - cxm) + (y - cym) * (y - cym)) ASC, image_id ASC) <= 3
        """,
        "phash_neardup_md5": """
            WITH base AS (
              SELECT doc_id AS id,
                     CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS phash
              FROM documents WHERE doc_id < 400
            ), sig AS (
              SELECT id, phash FROM base
              UNION ALL
              SELECT id + 500000,
                     xor(phash, (CAST(1 AS BIGINT) << CAST(id % 57 AS INTEGER))
                                | (CAST(1 AS BIGINT) << CAST((id * 7) % 57 AS INTEGER)))
              FROM base WHERE id % 3 = 0
            )
            SELECT a.id AS ida, b.id AS idb,
                   CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming
            FROM sig a JOIN sig b ON a.id < b.id
            WHERE bit_count(xor(a.phash, b.phash)) <= 4
        """,
        "seq_pack_stats": """
            WITH src AS (
              SELECT CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                          % 16 AS INTEGER) AS bucket,
                     LEAST(n_chars, 512) AS ln
              FROM documents
            )
            SELECT bucket, CAST(SUM(ln) AS BIGINT) AS bucket_tokens,
                   TRUE AS within_cap, TRUE AS halffull_ok, TRUE AS bins_ge_lb
            FROM src GROUP BY bucket
        """,
        # rows-only (by design): dedup_simhash (64-bit JVM hashes), ann_lsh
        # (approximate), multimodal_features (synthetic binary inputs) and
        # scan_monthly_median (image decode) — all covered by numpy/
        # brute-force oracles in tests/.
    }


def _sample_det_oracle() -> str:
    from gdalcubes_spark.pipeline.sampling import hash_bucket_sql
    return f"""
        SELECT doc_id, source FROM documents
        WHERE {hash_bucket_sql('doc_id')} < 150000
    """


def _sample_strat_oracle() -> str:
    from gdalcubes_spark.pipeline.sampling import hash_bucket_sql
    return f"""
        SELECT doc_id, source FROM documents
        QUALIFY ROW_NUMBER() OVER (PARTITION BY source
            ORDER BY {hash_bucket_sql('doc_id')} ASC, doc_id ASC) <= 25
    """


def _text_quality_by_source_oracle() -> str:
    from gdalcubes_spark.pipeline.text import quality_sql
    return f"""
        WITH q AS (SELECT source, {quality_sql('text')} AS q FROM documents)
        SELECT source, ROUND(quantile_cont(q, 0.25), 6) AS q1,
               ROUND(quantile_cont(q, 0.5), 6) AS q2,
               ROUND(quantile_cont(q, 0.75), 6) AS q3,
               COUNT(*) AS n_docs
        FROM q GROUP BY source
    """


def _text_pii_scan_oracle() -> str:
    from gdalcubes_spark.pipeline.text import pii_scan_sql
    planted = (f"(SELECT doc_id, text || CASE WHEN doc_id % 7 = 0 "
               f"THEN '{_PII_PLANT}' ELSE '' END AS text FROM documents) p")
    return pii_scan_sql(table=planted)


def _text_decontaminate_oracle() -> str:
    from gdalcubes_spark.pipeline.text import ngram_contamination_sql
    return ngram_contamination_sql(n=8)


def _text_ngrams_oracle() -> str:
    from gdalcubes_spark.pipeline.text import ngram_counts_sql
    return ngram_counts_sql(n=2, k=50)


def _text_winnow_oracle() -> str:
    from gdalcubes_spark.pipeline.text import rolling_fingerprints_sql
    return ("WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 200)\n"
            + rolling_fingerprints_sql())


def _sample_mixture_oracle() -> str:
    from gdalcubes_spark.pipeline.sampling import mixture_by_tokens_oracle_sql
    return mixture_by_tokens_oracle_sql(_MIX_BUDGETS)


def _curriculum_oracle() -> str:
    from gdalcubes_spark.pipeline.sampling import curriculum_shards_oracle_sql
    return curriculum_shards_oracle_sql(n_shards=10)


def _text_tokens_oracle() -> str:
    from gdalcubes_spark.pipeline.text import bpe_token_counts_oracle_sql
    return bpe_token_counts_oracle_sql()


def _text_tfidf_oracle() -> str:
    from gdalcubes_spark.pipeline.text import tfidf_top_terms_oracle_sql
    return tfidf_top_terms_oracle_sql(k=3)


def _text_stats_oracle() -> str:
    from gdalcubes_spark.pipeline.text import (fingerprint_sql, lang_id_sql, n_tokens_sql,
                                               quality_sql, stopword_count_sql)
    c = "text"
    return f"""
        SELECT doc_id,
               {n_tokens_sql(c)} AS n_tokens,
               ROUND(CAST({stopword_count_sql(c)} AS DOUBLE) / {n_tokens_sql(c)}, 6) AS stop_ratio,
               {quality_sql(c)} AS quality,
               {lang_id_sql(c)} AS lang_pred,
               {fingerprint_sql(c)} AS fingerprint
        FROM documents
    """
