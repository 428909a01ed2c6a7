"""Distributed Lloyd's k-means over an embedding column.

The ANN quantizers (ivf_topk / pq_topk) train on a bounded md5-bucket
sample driver-side — right for seeding, but at corpus scale the refinement
iterations should see ALL vectors. This is the classic MapReduce k-means:
each iteration is one executor-side pass emitting per-partition partial
(count, vector-sum) rows per centroid — k·dim·partitions floats through the
shuffle, independent of corpus size — merged by a tiny groupBy, with the
new centroids broadcast back in the next closure.

Determinism: seeding uses the same md5-bucket sample as the ANN trainers
(layout-independent); partial sums are float64 and merged with a
deterministic sort, so results are reproducible across runs on the same
data (floating addition order is fixed by the sort).
"""

from __future__ import annotations

from typing import Iterable, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gdalcubes_spark.pipeline.similarity import _norm_rows

_PART_SCHEMA = T.StructType([
    T.StructField("centroid", T.IntegerType(), False),
    T.StructField("n", T.LongType(), False),
    T.StructField("vsum", T.BinaryType(), False),  # float64 vector bytes
])


def distributed_kmeans(embeddings: DataFrame, k: int = 16, iters: int = 5,
                       seed: int = 42, id_col: str = "vec_id",
                       vec_col: str = "embedding", normalize: bool = True,
                       seed_rows: int = 4096) -> np.ndarray:
    """Lloyd's over the FULL corpus: returns (k, dim) float64 centroids
    (unit-norm when normalize=True — spherical k-means, the cosine-ANN
    setting). Each iteration shuffles only k·dim partial sums per
    partition."""
    from gdalcubes_spark.pipeline.dedup import widen_input
    from gdalcubes_spark.pipeline.sampling import _BUCKETS, _hash_bucket

    n_total = embeddings.count()
    frac = min(1.0, (4.0 * seed_rows) / max(n_total, 1))
    sample = (embeddings.select(F.col(id_col), F.col(vec_col))
              .withColumn("_hb", _hash_bucket(id_col))
              .filter(F.col("_hb") < int(frac * _BUCKETS))
              .orderBy("_hb", id_col).limit(seed_rows)
              .select(vec_col).toPandas())
    X = np.stack(sample[vec_col].to_numpy()).astype("float64")
    if normalize:
        X = _norm_rows(X)
    rng = np.random.default_rng(seed)
    k_eff = min(k, len(X))
    C = X[rng.choice(len(X), size=k_eff, replace=False)].copy()
    dim = C.shape[1]

    src = widen_input(embeddings.select(vec_col))
    for _ in range(iters):
        C_b = C  # captured by value in the closure below

        def partials(batches: Iterable[pd.DataFrame]):
            cnt = np.zeros(k_eff, dtype=np.int64)
            acc = np.zeros((k_eff, dim), dtype=np.float64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                E = np.stack(pdf[vec_col].to_numpy()).astype("float64")
                if normalize:
                    E = _norm_rows(E)
                if normalize:
                    a = np.argmax(E @ C_b.T, axis=1)
                else:
                    d2 = (E * E).sum(1)[:, None] - 2.0 * (E @ C_b.T) + (C_b * C_b).sum(1)[None]
                    a = np.argmin(d2, axis=1)
                np.add.at(cnt, a, 1)
                np.add.at(acc, a, E)
            nz = np.nonzero(cnt)[0]
            yield pd.DataFrame(dict(centroid=nz.astype("int32"),
                                    n=cnt[nz],
                                    vsum=[acc[j].tobytes() for j in nz]))

        rows = sorted(src.mapInPandas(partials, _PART_SCHEMA).collect(),
                      key=lambda r: (r["centroid"], r["n"], r["vsum"]))
        cnt = np.zeros(k_eff, dtype=np.int64)
        acc = np.zeros((k_eff, dim), dtype=np.float64)
        for r in rows:  # deterministic merge order
            j = r["centroid"]
            cnt[j] += r["n"]
            acc[j] += np.frombuffer(r["vsum"], dtype=np.float64)
        live = cnt > 0
        C[live] = acc[live] / cnt[live, None]
        if normalize:
            C = _norm_rows(C)
    return C


def kmeans_assign(embeddings: DataFrame, C: np.ndarray,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  normalize: bool = True) -> DataFrame:
    """(id, centroid) assignment under the trained centroids — one
    executor-side pass, the bucketing step for IVF lists / dataset
    partitioning."""
    from gdalcubes_spark.pipeline.dedup import widen_input
    k_eff = C.shape[0]

    schema = T.StructType([T.StructField("vid", T.LongType(), False),
                           T.StructField("centroid", T.IntegerType(), False)])

    def assign(batches: Iterable[pd.DataFrame]):
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(dict(vid=pd.Series(dtype="int64"),
                                        centroid=pd.Series(dtype="int32")))
                continue
            E = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            if normalize:
                E = _norm_rows(E)
                a = np.argmax(E @ C.T, axis=1)
            else:
                d2 = (E * E).sum(1)[:, None] - 2.0 * (E @ C.T) + (C * C).sum(1)[None]
                a = np.argmin(d2, axis=1)
            yield pd.DataFrame(dict(vid=pdf[id_col].to_numpy(),
                                    centroid=a.astype("int32")))

    return widen_input(embeddings.select(id_col, vec_col)).mapInPandas(assign, schema)
