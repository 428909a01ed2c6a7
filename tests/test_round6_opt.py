"""Round-6 optimization regression tests: the changed internals must stay
value-identical to their reference formulations.

- median finalize: dense-stack sort path == sparse pair-lexsort path
- reduce_time sort-gather median == np.nanmedian
- PNG filter-0 fast path roundtrip
- JPEG decode/encode identical across the optimized entropy loop
- scan fusion: map_chunks on a raster_cube == unfused computation
- cosine_neardup_pairs_bucketed: derived plane count keeps clone recall
"""

import numpy as np
import pytest

from gdalcubes_spark import codecs
from gdalcubes_spark.sources.raster_cube import _AggState


def _pair_sort_reference(items, shape):
    """The pre-r6 sparse formulation, kept as the oracle."""
    nb, nt, ny, nx = shape
    acc = np.full(shape, np.nan)
    plane = ny * nx
    for lt in range(nt):
        idx_parts, val_parts = [], []
        for vals, y0, x0 in items.get(lt, []):
            ok = ~np.isnan(vals)
            if not ok.any():
                continue
            b, yy, xx = np.nonzero(ok)
            idx_parts.append(b * plane + (yy + y0) * nx + (xx + x0))
            val_parts.append(vals[ok])
        if not idx_parts:
            continue
        idx = np.concatenate(idx_parts)
        val = np.concatenate(val_parts)
        order = np.lexsort((val, idx))
        idx, val = idx[order], val[order]
        starts = np.nonzero(np.diff(idx, prepend=-1))[0]
        counts = np.diff(np.append(starts, len(idx)))
        lo = starts + (counts - 1) // 2
        hi = starts + counts // 2
        med = (val[lo] + val[hi]) / 2.0
        acc[:, lt].reshape(nb * plane)[idx[starts]] = med
    return acc


def _random_items(rng, nb, ny, nx, k, nan_frac):
    items = []
    for _ in range(k):
        hy = rng.integers(1, ny + 1)
        wx = rng.integers(1, nx + 1)
        y0 = rng.integers(0, ny - hy + 1)
        x0 = rng.integers(0, nx - wx + 1)
        vals = rng.random((nb, hy, wx))
        vals[rng.random((nb, hy, wx)) < nan_frac] = np.nan
        items.append((vals, int(y0), int(x0)))
    return items


@pytest.mark.parametrize("k,nan_frac", [(1, 0.0), (7, 0.3), (40, 0.05), (3, 1.0)])
def test_median_finalize_dense_equals_pair_sort(k, nan_frac):
    rng = np.random.default_rng(k * 1000 + int(nan_frac * 10))
    nb, nt, ny, nx = 2, 2, 17, 13
    st = _AggState("median", (nb, nt, ny, nx))
    ref_items = {}
    for lt in range(nt):
        its = _random_items(rng, nb, ny, nx, k, nan_frac)
        ref_items[lt] = [(v.copy(), y, x) for v, y, x in its]
        for v, y, x in its:
            st.update(v, lt, y, x)
    dense = st.finalize()
    ref = _pair_sort_reference(ref_items, (nb, nt, ny, nx))
    assert np.array_equal(dense.view(np.uint64), ref.view(np.uint64)), \
        "dense median finalize diverged from the pair-sort reference"


def test_median_finalize_sparse_fallback_identical():
    """Force the sparse fallback (budget=0) and compare against dense."""
    rng = np.random.default_rng(7)
    nb, nt, ny, nx = 1, 1, 9, 9
    items = _random_items(rng, nb, ny, nx, 11, 0.2)

    def run(budget):
        st = _AggState("median", (nb, nt, ny, nx))
        st._MEDIAN_DENSE_BYTES = budget
        for v, y, x in items:
            st.update(v.copy(), 0, y, x)
        return st.finalize()

    dense = run(1 << 40)
    sparse = run(0)
    assert np.array_equal(dense.view(np.uint64), sparse.view(np.uint64))


def test_reduce_median_sort_gather_equals_nanmedian():
    from gdalcubes_spark.reducers import full_reduce
    rng = np.random.default_rng(3)
    v = rng.random((9, 2, 11, 5))
    v[rng.random(v.shape) < 0.25] = np.nan
    v[:, 0, 0, 0] = np.nan  # an all-NaN cell
    got = full_reduce("median", v)
    allnan = np.all(np.isnan(v), axis=0)
    ref = np.where(allnan, np.nan,
                   np.nanmedian(np.where(allnan[None, ...], 0.0, v), axis=0))
    assert np.array_equal(got.view(np.uint64), ref.view(np.uint64))


def test_png_fast_path_roundtrip_and_filtered_rows():
    rng = np.random.default_rng(5)
    for nb in (1, 2, 3, 4):
        a = rng.integers(0, 256, size=(nb, 23, 31), dtype=np.uint8)
        assert np.array_equal(codecs.decode(codecs.encode(a, "png"), "png"), a)
    # a PNG with non-zero filters still decodes through the general loop
    import struct
    import zlib
    h, w = 4, 5
    rows_px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    raw = bytearray()
    prev = np.zeros(w, dtype=np.uint8)
    for r in range(h):
        raw.append(2)  # Up filter
        raw += bytes((rows_px[r] - prev) & 0xFF)
        prev = rows_px[r]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    png = (b"\x89PNG\r\n\x1a\n" + codecs._png_chunk(b"IHDR", ihdr)
           + codecs._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
           + codecs._png_chunk(b"IEND", b""))
    assert np.array_equal(codecs.decode(png, "png")[0], rows_px)


def test_jpeg_roundtrip_stable():
    """Encode bytes and decoded pixels are pinned across the optimized
    entropy loop (restart markers exercise the segment-split path)."""
    from gdalcubes_spark.jpegcodec import decode_baseline, encode_baseline
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=(3, 40, 48), dtype=np.uint8)
    for sub in ("444", "420"):
        for ri in (0, 2):
            enc = encode_baseline(a, quality=90, subsampling=sub, restart_interval=ri)
            dec = decode_baseline(enc)
            assert dec.shape == a.shape
            # re-encoding the decode must be deterministic (same bytes)
            assert encode_baseline(dec, quality=90, subsampling=sub,
                                   restart_interval=ri) == \
                encode_baseline(dec, quality=90, subsampling=sub,
                                restart_interval=ri)
            if sub == "444":
                err = np.abs(dec.astype(float) - a.astype(float)).mean()
                assert err < 16.0  # sanity: quality 90 on noise, no subsampling


def test_scan_fusion_matches_unfused(spark):
    from gdalcubes_spark.grid import ChunkGrid, CubeView
    from gdalcubes_spark.sources.raster_cube import raster_cube
    from gdalcubes_spark.synth import ImageLayout, band_names, generate_images

    lay = ImageLayout(left0=0.0, top0=2.0, tile_dx=1.0, tile_dy=1.0, gx=2, gy=2,
                      ntime=2, dt_days=31, tile_w=16, tile_h=16, nb=2,
                      fmts=("png", "raw"), hot_every=5, overlap=0.2)
    imgs = generate_images(spark, 16, lay)
    v = CubeView.create(srs="EPSG:4326", left=0, right=2, bottom=0, top=2,
                        t0="2021-01-01", t1="2021-02-28", dt="P1M",
                        dx=1.0 / 16, dy=1.0 / 16,
                        aggregation="median", resampling="bilinear")
    g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=16, cx=16)
    cube = raster_cube(imgs, v, band_names(lay), chunking=g)
    fused = cube.apply_pixel("(b02 - b01) / (b02 + b01 + 1)", ["ndvi"])
    # the fusion hook must have fired: no extra ArrowEval node in the plan
    assert getattr(fused, "_fuse_into_scan", None) is not None
    arr_f = fused.collect_array()
    base = raster_cube(imgs, v, band_names(lay), chunking=g).collect_array()
    ref = (base[1] - base[0]) / (base[1] + base[0] + 1)
    assert np.array_equal(arr_f[0], ref, equal_nan=True)
    # salted scan: the fused chain after merge equals the unfused map_chunks
    # over the same salted scan (salted vs unsalted mean differs in ULP by
    # design — summation order — so compare fused vs unfused, both salted)
    v2 = v.copy()
    v2.aggregation = "mean"
    sc1 = raster_cube(imgs, v2, band_names(lay), chunking=g, salt=2)
    salted_fused = sc1.apply_pixel("b01 + b02", ["s"]).collect_array()
    sc2 = raster_cube(imgs, v2, band_names(lay), chunking=g, salt=2)
    del sc2._fuse_into_scan  # force the plain mapInPandas path
    salted_unfused = sc2.apply_pixel("b01 + b02", ["s"]).collect_array()
    assert np.array_equal(salted_fused, salted_unfused, equal_nan=True)


def test_scan_fusion_stream_thunk_routes(spark):
    """Both consumer routes of a scan-fused narrow chain must match the
    unfused computation: the combinable reduce (chunk_stream -> lazy
    bare-scan thunk, chain applied in the consumer's UDF) and the gather
    median (direct cube.df, chain applied inside the scan build)."""
    from gdalcubes_spark.grid import ChunkGrid, CubeView
    from gdalcubes_spark.sources.raster_cube import raster_cube
    from gdalcubes_spark.synth import ImageLayout, band_names, generate_images

    lay = ImageLayout(left0=0.0, top0=2.0, tile_dx=1.0, tile_dy=1.0, gx=2, gy=2,
                      ntime=3, dt_days=31, tile_w=16, tile_h=16, nb=2,
                      fmts=("png", "raw"), hot_every=5, overlap=0.2)
    imgs = generate_images(spark, 24, lay)
    v = CubeView.create(srs="EPSG:4326", left=0, right=2, bottom=0, top=2,
                        t0="2021-01-01", t1="2021-03-31", dt="P1M",
                        dx=1.0 / 16, dy=1.0 / 16,
                        aggregation="mean", resampling="bilinear")
    g = ChunkGrid(nt=v.nt, ny=v.ny, nx=v.nx, ct=1, cy=16, cx=16)
    fused = raster_cube(imgs, v, band_names(lay), chunking=g) \
        .apply_pixel("b01 * 2 + b02", ["s"])
    ref_cube = raster_cube(imgs, v, band_names(lay), chunking=g)
    del ref_cube._fuse_into_scan  # force the plain map_chunks path
    ref = ref_cube.apply_pixel("b01 * 2 + b02", ["s"])
    got_c = fused.reduce_time("mean(s)", "max(s)").collect_array()
    ref_c = ref.reduce_time("mean(s)", "max(s)").collect_array()
    assert np.array_equal(got_c, ref_c, equal_nan=True)
    got_m = fused.reduce_time("median(s)", names=["m"]).collect_array()
    ref_m = ref.reduce_time("median(s)", names=["m"]).collect_array()
    assert np.array_equal(got_m, ref_m, equal_nan=True)


def test_cc_input_fixpoint_early_stop(spark):
    """A pure-pair graph (already a star per component) must converge after
    ONE star round via the input-canonical-signature check, and a chain
    graph must still run full rounds and collapse to its minimum label."""
    import gdalcubes_spark.pipeline.components as C
    calls = {"n": 0}
    orig = C._small_star

    def counting(e):
        calls["n"] += 1
        return orig(e)

    C._small_star = counting
    try:
        pairs = spark.createDataFrame([(i, i + 1000) for i in range(50)],
                                      "ida long, idb long")
        comp = {r["id"]: r["component"]
                for r in C.connected_components(pairs).collect()}
        assert calls["n"] == 1, f"pure pairs took {calls['n']} rounds"
        assert all(comp[i] == i and comp[i + 1000] == i for i in range(50))
        calls["n"] = 0
        chain = spark.createDataFrame([(i, i + 1) for i in range(20)],
                                      "ida long, idb long")
        comp2 = {r["id"]: r["component"]
                 for r in C.connected_components(chain).collect()}
        assert calls["n"] > 1
        assert all(v == 0 for v in comp2.values())
    finally:
        C._small_star = orig


def test_neardup_plane_count_derivation(spark):
    from pyspark.sql import functions as F
    from gdalcubes_spark.pipeline.similarity import cosine_neardup_pairs_bucketed
    import pandas as pd
    rng = np.random.default_rng(9)
    n, dim = 60, 16
    E = rng.standard_normal((n, dim))
    rows = [(i, [float(x) for x in E[i]]) for i in range(n)]
    rows += [(i + 1000, [float(2.0 * x) for x in E[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_neardup_pairs_bucketed(df, threshold=0.999).toPandas()
    got = set(zip(out["ida"], out["idb"]))
    assert {(i, i + 1000) for i in range(n)} <= got, \
        "scaled clones must always be recalled at the derived plane count"
