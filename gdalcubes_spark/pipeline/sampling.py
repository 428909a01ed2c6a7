"""Deterministic sampling for training-data pipelines.

A 100 TB corpus is never trained on whole: pipelines draw reproducible
samples (same rows on every run, on any cluster size, in any row order) and
domain-stratified mixes ("200k docs per source"). Both need a sampling
decision that is a pure function of the ROW, not of partitioning or RNG
state — we hash a key column to a uniform bucket.

Engine-agnostic by construction: the hash is the first 15 hex chars of
md5(key) (same trick as the md5 SimHash / winnowing fingerprints), so the
exact same sample is computable in ANSI SQL — sampling decisions can be
audited outside Spark.

Scale shape: deterministic_sample is a pure filter (no shuffle, fully
pushdown-friendly); stratified_sample is one window per group ordered by
hash (one shuffle on the group key — the unavoidable minimum, since a
per-group quota is a per-group top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_BUCKETS = 1_000_000


def _hash_bucket(key_col: str):
    """Uniform bucket in [0, 1e6) from md5 — identical in DuckDB SQL."""
    h = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(_BUCKETS))


def hash_bucket_sql(key_col: str) -> str:
    """DuckDB rendering of _hash_bucket (same values bit-for-bit)."""
    return (f"CAST('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15) AS BIGINT) "
            f"% {_BUCKETS}")


def deterministic_sample(df: DataFrame, fraction: float, key_col: str = "doc_id") -> DataFrame:
    """Keep rows whose hash bucket falls below fraction. Same rows every run,
    independent of partitioning/order; a plain filter, so Catalyst pushes it
    into the scan."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(_hash_bucket(key_col) < int(fraction * _BUCKETS))


def stratified_sample(df: DataFrame, group_col: str, n_per_group: int,
                      key_col: str = "doc_id", oversample: int = 4) -> DataFrame:
    """Exactly min(n, group size) rows per group, chosen by hash order —
    reproducible quota sampling (training-mix construction).

    Scale shape: a plain per-group row_number window funnels each group
    through ONE task — a billion-row domain would serialize. Instead, a
    per-group hash-bucket THRESHOLD (broadcast from the group counts) first
    cuts each group to ~oversample·n candidate rows (a narrow filter), and
    the window ranks only the candidates. Exactness is guaranteed, not
    probabilistic: every excluded row has a LARGER bucket than every
    candidate, so the true top-n by (bucket, key) order lies inside the
    candidate set whenever the group produced ≥ min(n, group size)
    candidates; the rare short group (binomial tail) is re-ranked without
    the filter. Output is identical to the one-window form on any input."""
    cols = df.columns
    hb = _hash_bucket(key_col)
    with_b = df.withColumn("_hb", hb)
    counts = with_b.groupBy(group_col).agg(F.count("*").alias("_m"))
    thr = F.least(F.lit(_BUCKETS),
                  F.ceil(F.lit(float(oversample * n_per_group) * _BUCKETS) / F.col("_m"))).cast("long")
    lim = F.broadcast(counts.select(group_col, thr.alias("_thr"), "_m"))
    cand = with_b.join(lim, group_col).filter(F.col("_hb") < F.col("_thr"))
    w = W.partitionBy(group_col).orderBy(F.col("_hb").asc(), F.col(key_col).asc())
    ranked = cand.withColumn("_rk", F.row_number().over(w))
    # Short-group detection must start from `counts` (every group that exists),
    # not from the candidate set: a group whose filter produced ZERO candidates
    # never appears in the ranked output and would otherwise be dropped
    # entirely instead of entering the exact fallback.
    got = ranked.groupBy(group_col).agg(F.count("*").alias("_got"))
    short = (counts.join(got, group_col, "left")
             .withColumn("_got", F.coalesce(F.col("_got"), F.lit(0)))
             .filter(F.col("_got") < F.least(F.lit(n_per_group), F.col("_m")))
             .select(group_col))
    picked = (ranked.join(F.broadcast(short), group_col, "left_anti")
              .filter(F.col("_rk") <= n_per_group).select(*cols))
    # fallback: re-rank short groups over ALL their rows (exactness guarantee)
    fb_rows = with_b.join(F.broadcast(short), group_col)
    fb = (fb_rows.withColumn("_rk", F.row_number().over(w))
          .filter(F.col("_rk") <= n_per_group).select(*cols))
    return picked.unionByName(fb)


def mixture_by_tokens(df: DataFrame, budgets: dict, group_col: str = "source",
                      key_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Token-budget data mixture: per source, take the deterministic
    hash-ordered PREFIX of documents until that source's token budget is
    reached (the boundary document that crosses the budget is included —
    greedy prefix, so every budget is met, never undershot). Sources absent
    from `budgets` contribute nothing. Returns (key, group, n_tokens).

    This is the "30% web / 50% code / 20% books, by TOKENS not documents"
    op of training-mix construction, reproducible on any cluster / row
    order / partitioning (pure function of md5(key)).

    Scale shape (two-phase, exactness guaranteed like stratified_sample):
    a naive per-source running-sum window funnels each source through one
    task. Instead phase 1 aggregates token sums per (source, coarse bucket)
    — ≤ ~3.9k rows per source — and classifies buckets: cumulative-before <
    budget ≤ cumulative-inclusive marks the single BOUNDARY bucket; earlier
    buckets pass whole (their inclusive cumulative ≤ budget ⇒ every doc's
    before-sum < budget), later buckets are dropped. Phase 2 windows ONLY
    the boundary bucket's docs (~corpus/3907 per source). Identical output
    to the one-window form on any input."""
    from gdalcubes_spark.pipeline.text import n_tokens_sql

    coarse = 256  # 1e6 hash buckets // 256 → 3907 coarse buckets per source
    budget_expr = F.coalesce(
        *([F.when(F.col(group_col) == F.lit(s), F.lit(float(b))) for s, b in budgets.items()]
          + [F.lit(None).cast("double")]))
    with_b = (df
              .withColumn("_tok", F.expr(n_tokens_sql(text_col)))
              .withColumn("_hb", _hash_bucket(key_col))
              .withColumn("_cb", (F.col("_hb") / coarse).cast("long"))
              .withColumn("_budget", budget_expr)
              .filter(F.col("_budget").isNotNull()))

    bs = (with_b.groupBy(group_col, "_cb")
          .agg(F.sum("_tok").alias("_bsum"), F.max("_budget").alias("_budget")))
    wb = W.partitionBy(group_col).orderBy("_cb")
    bs = (bs.withColumn("_cum", F.sum("_bsum").over(wb))
          .withColumn("_before", F.col("_cum") - F.col("_bsum"))
          .withColumn("_class", F.when(F.col("_cum") <= F.col("_budget"), F.lit("all"))
                      .when(F.col("_before") < F.col("_budget"), F.lit("boundary"))
                      .otherwise(F.lit("drop"))))

    cls = bs.select(group_col, "_cb", "_class", "_before")
    joined = with_b.join(cls, [group_col, "_cb"])
    whole = joined.filter(F.col("_class") == "all")
    wd = W.partitionBy(group_col).orderBy(F.col("_hb").asc(), F.col(key_col).asc())
    boundary = (joined.filter(F.col("_class") == "boundary")
                .withColumn("_cumdoc", F.sum("_tok").over(wd))
                .filter(F.col("_before") + F.col("_cumdoc") - F.col("_tok") < F.col("_budget")))
    out_cols = [F.col(key_col), F.col(group_col), F.col("_tok").alias("n_tokens")]
    return whole.select(*out_cols).unionByName(boundary.select(*out_cols))


def mixture_by_tokens_naive(df: DataFrame, budgets: dict, group_col: str = "source",
                            key_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One-window reference form (the oracle shape) — used by tests to prove
    the two-phase plan is exact; don't use at scale (one task per source)."""
    from gdalcubes_spark.pipeline.text import n_tokens_sql
    budget_expr = F.coalesce(
        *([F.when(F.col(group_col) == F.lit(s), F.lit(float(b))) for s, b in budgets.items()]
          + [F.lit(None).cast("double")]))
    w = W.partitionBy(group_col).orderBy(_hash_bucket(key_col).asc(), F.col(key_col).asc())
    return (df.withColumn("_tok", F.expr(n_tokens_sql(text_col)))
            .withColumn("_budget", budget_expr).filter(F.col("_budget").isNotNull())
            .withColumn("_cum", F.sum("_tok").over(w))
            .filter(F.col("_cum") - F.col("_tok") < F.col("_budget"))
            .select(F.col(key_col), F.col(group_col), F.col("_tok").alias("n_tokens")))


def mixture_by_tokens_oracle_sql(budgets: dict, group_col: str = "source",
                                 key_col: str = "doc_id", text_col: str = "text",
                                 table: str = "documents") -> str:
    """DuckDB rendering of the one-window form (identical rows)."""
    from gdalcubes_spark.pipeline.text import n_tokens_sql
    cases = " ".join(f"WHEN '{s}' THEN {float(b)}" for s, b in budgets.items())
    return f"""
        WITH t AS (
          SELECT {key_col}, {group_col}, {n_tokens_sql(text_col)} AS n_tokens,
                 CASE {group_col} {cases} ELSE NULL END AS budget,
                 {hash_bucket_sql(key_col)} AS hb
          FROM {table}
        )
        SELECT {key_col}, {group_col}, n_tokens FROM (
          SELECT *, SUM(n_tokens) OVER (PARTITION BY {group_col}
                                        ORDER BY hb, {key_col}) AS cum
          FROM t WHERE budget IS NOT NULL
        ) WHERE cum - n_tokens < budget
    """


def curriculum_shards(df: DataFrame, n_shards: int = 10, text_col: str = "text",
                      key_col: str = "doc_id") -> DataFrame:
    """Curriculum bucketing: label every document with its quality-quantile
    shard (0 = lowest decile … n-1 = highest) so training can order or
    re-weight shards. Returns (key, quality, shard).

    Scale shape: NOT a global ntile window (one task for the whole sort) —
    exact quantile THRESHOLDS come from one aggregate (`percentile`, linear
    interpolation, parity with DuckDB quantile_cont already proven by the
    text_quality_by_source oracle) and shard assignment is a broadcast
    comparison sum in codegen. Ties at a threshold go to the lower shard in
    both engines (strict >)."""
    from gdalcubes_spark.pipeline.text import quality_sql
    q = df.select(F.col(key_col), F.expr(quality_sql(text_col)).alias("quality"))
    fracs = [i / n_shards for i in range(1, n_shards)]
    th = q.select(F.expr(
        f"percentile(quality, array({', '.join(str(f) for f in fracs)}))").alias("t")).first()["t"]
    shard = sum((F.col("quality") > F.lit(float(t))).cast("int") for t in th)
    return q.select(key_col, "quality", shard.alias("shard"))


def curriculum_shards_oracle_sql(n_shards: int = 10, text_col: str = "text",
                                 key_col: str = "doc_id", table: str = "documents") -> str:
    """DuckDB rendering (same thresholds via quantile_cont, same strict >)."""
    from gdalcubes_spark.pipeline.text import quality_sql
    fracs = ", ".join(str(i / n_shards) for i in range(1, n_shards))
    return f"""
        WITH q AS (SELECT {key_col}, {quality_sql(text_col)} AS quality FROM {table}),
        t AS (SELECT quantile_cont(quality, [{fracs}]) AS th FROM q)
        SELECT {key_col}, quality,
               CAST(list_sum(list_transform(th, x -> CASE WHEN quality > x THEN 1 ELSE 0 END))
                    AS INT) AS shard
        FROM q CROSS JOIN t
    """
