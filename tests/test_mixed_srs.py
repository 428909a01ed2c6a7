"""Mixed-SRS inventory: UTM-native images scanned into a 4326 view (and vice
versa) — the reprojection path of the scan (gdalwarp equivalent)."""

import numpy as np
import pytest

from gdalcubes_spark import srs
from gdalcubes_spark.grid import ChunkGrid, CubeView
from gdalcubes_spark.sources.raster_cube import raster_cube
from gdalcubes_spark.synth import ImageLayout, band_names, generate_images, native_bbox


LAY = ImageLayout(left0=8.0, top0=52.0, tile_dx=0.5, tile_dy=0.5, gx=2, gy=2,
                  ntime=2, tile_w=32, tile_h=32, nb=1, fmts=("raw",),
                  utm_every=2, utm_zone=32)  # every 2nd image native-UTM32N


class TestMixedSrs:
    def test_metadata_has_native_bbox(self, spark):
        imgs = generate_images(spark, 8, LAY).toPandas().sort_values("image_id")
        assert set(imgs["epsg"]) == {4326, 32632}
        utm = imgs[imgs.epsg == 32632].iloc[0]
        assert utm["nleft"] > 100000  # meters, not degrees
        assert abs(utm["left"] - 8.0) < 1.0  # 4326 bbox still degrees

    def test_utm_image_into_4326_view_matches_oracle(self, spark):
        imgs = generate_images(spark, 8, LAY)
        v = CubeView.create(srs="EPSG:4326", left=8.0, right=9.0, bottom=51.0, top=52.0,
                            t0="2021-01-01", t1="2021-01-02", dt="P1D", dx=1 / 64, dy=1 / 64,
                            aggregation="first", resampling="near")
        g = ChunkGrid(nt=2, ny=64, nx=64, ct=1, cy=32, cx=32)
        a = raster_cube(imgs, v, band_names(LAY), chunking=g).collect_array()
        # independent oracle: for each covered cell, transform the center to
        # the image's native SRS, index its pixel grid, recompute the pattern
        checked = 0
        for i in range(8):
            p = LAY.params(i)
            epsg, nl, nr, nb_, nt_ = native_bbox(LAY, i)
            it = p["tt"]
            pdx, pdy = (nr - nl) / 32, (nt_ - nb_) / 32
            for iy in range(0, 64, 7):
                for ix in range(0, 64, 7):
                    xc = v.left + (ix + 0.5) * v.dx
                    yc = v.top - (iy + 0.5) * v.dy
                    if not (p["left"] < xc < p["right"] and p["bottom"] < yc < p["top"]):
                        continue
                    if epsg == 32632:
                        X, Y = srs.geodetic_to_utm(xc, yc, zone=32)
                    else:
                        X, Y = xc, yc
                    px = int((X - nl) / pdx)
                    py = int((nt_ - Y) / pdy)
                    if not (0 <= px < 32 and 0 <= py < 32):
                        continue
                    want = float((p["a"] * px + p["b"] * py + p["d"]) % 256)
                    got = a[0, it, iy, ix]
                    # "first" aggregation: cell may be owned by an earlier
                    # image when tiles overlap — only check unambiguous cells
                    owners = [j for j in range(8)
                              if LAY.params(j)["tt"] == it
                              and LAY.params(j)["left"] < xc < LAY.params(j)["right"]
                              and LAY.params(j)["bottom"] < yc < LAY.params(j)["top"]]
                    if owners and owners[0] == i:
                        assert got == want, (i, iy, ix, got, want)
                        checked += 1
        assert checked > 50

    def test_utm_view_full_coverage(self, spark):
        imgs = generate_images(spark, 8, LAY)
        # view in UTM32 over the same region: both image kinds contribute
        l, b = srs.geodetic_to_utm(8.05, 51.05, zone=32)
        r, t = srs.geodetic_to_utm(8.9, 51.9, zone=32)
        v = CubeView.create(srs="EPSG:32632", left=float(l), right=float(r),
                            bottom=float(b), top=float(t),
                            t0="2021-01-01", t1="2021-01-02", dt="P1D", nx=48, ny=48,
                            aggregation="first", resampling="bilinear")
        g = ChunkGrid(nt=2, ny=48, nx=48, ct=1, cy=24, cx=24)
        a = raster_cube(imgs, v, band_names(LAY), chunking=g).collect_array()
        frac = np.isfinite(a).mean()
        assert frac > 0.9, frac  # near-full coverage through reprojection


class TestBandPushdown:
    def test_select_bands_replans_scan(self, spark):
        lay = ImageLayout(left0=0, top0=4, tile_dx=2.0, tile_dy=2.0, gx=2, gy=2,
                          ntime=2, tile_w=16, tile_h=16, nb=3, fmts=("raw",))
        imgs = generate_images(spark, 8, lay)
        v = CubeView.create(srs="EPSG:4326", left=0, right=4, bottom=0, top=4,
                            t0="2021-01-01", t1="2021-01-02", dt="P1D", dx=0.25, dy=0.25,
                            aggregation="first", resampling="near")
        g = ChunkGrid(nt=2, ny=16, nx=16, ct=1, cy=8, cx=8)
        full = raster_cube(imgs, v, band_names(lay), chunking=g)
        sel = full.select_bands(["B03"])
        assert sel.bands == ["B03"]
        a = sel.collect_array()
        want = full.collect_array()[2:3]
        assert np.allclose(np.nan_to_num(a, nan=-1), np.nan_to_num(want, nan=-1))
        # the pushed-down scan really carries 1 band per chunk row
        assert sel.df.select("nb").distinct().collect()[0]["nb"] == 1

    def test_pushdown_keeps_mask_band_semantics(self, spark):
        from gdalcubes_spark.sources.raster_cube import ImageMask
        lay = ImageLayout(left0=0, top0=4, tile_dx=2.0, tile_dy=2.0, gx=2, gy=2,
                          ntime=1, tile_w=16, tile_h=16, nb=2, fmts=("raw",))
        imgs = generate_images(spark, 4, lay)
        v = CubeView.create(srs="EPSG:4326", left=0, right=4, bottom=0, top=4,
                            t0="2021-01-01", t1="2021-01-01", dt="P1D", dx=0.25, dy=0.25,
                            aggregation="first", resampling="near")
        g = ChunkGrid(nt=1, ny=16, nx=16, ct=1, cy=16, cx=16)
        m = ImageMask("B01", vmin=-0.5, vmax=127.5)
        full = raster_cube(imgs, v, band_names(lay), chunking=g, mask=m)
        sel = raster_cube(imgs, v, band_names(lay), chunking=g, mask=m).select_bands(["B02"])
        assert sel.bands == ["B02"]
        a = sel.collect_array()
        want = full.collect_array()[1:2]
        assert np.allclose(np.nan_to_num(a, nan=-1), np.nan_to_num(want, nan=-1))


class TestWebMercator:
    def test_known_values_and_roundtrip(self):
        x, y = srs.geodetic_to_webmercator(180.0, 0.0)
        assert abs(float(x) - 20037508.342789244) < 1e-6  # published constant
        assert abs(float(y)) < 1e-9
        lon = np.linspace(-179, 179, 40)
        lat = np.linspace(-84, 84, 40)
        lo, la = srs.webmercator_to_geodetic(*srs.geodetic_to_webmercator(lon, lat))
        assert np.allclose(lo, lon, atol=1e-9) and np.allclose(la, lat, atol=1e-9)

    def test_latitude_clamped_to_validity_bound(self):
        _, y1 = srs.geodetic_to_webmercator(0.0, 90.0)
        _, y2 = srs.geodetic_to_webmercator(0.0, 85.051128779807)
        assert np.isfinite(y1) and abs(float(y1) - float(y2)) < 1e-6

    def test_3857_view_scan_matches_numpy_oracle(self, spark):
        """Web-Mercator VIEW over 4326 scenes: every cube cell must equal an
        independent numpy oracle that maps the same merc cell centers back
        to lon/lat and nearest-samples the analytic image pattern — the
        exact-equality test of the 3857 reprojection path end to end."""
        lay = ImageLayout(left0=0.0, top0=1.0, tile_dx=1.0, tile_dy=1.0, gx=2, gy=1,
                          ntime=1, tile_w=32, tile_h=32, nb=1, fmts=("raw",))
        imgs = generate_images(spark, 2, lay)
        l, b = srs.geodetic_to_webmercator(0.0, 0.0)
        r, t = srs.geodetic_to_webmercator(2.0, 1.0)
        ny, nx = 8, 20
        v3857 = CubeView.create(srs="EPSG:3857", left=float(l), right=float(r),
                                bottom=float(b), top=float(t),
                                t0="2021-01-01", t1="2021-01-01", dt="P1D",
                                nx=nx, ny=ny, aggregation="first", resampling="near")
        g = ChunkGrid(nt=1, ny=ny, nx=nx, ct=1, cy=4, cx=10)
        a3 = raster_cube(imgs, v3857, band_names(lay), chunking=g).collect_array()
        assert np.isfinite(a3).all()
        xs = float(l) + (np.arange(nx) + 0.5) * v3857.dx
        ys = float(t) - (np.arange(ny) + 0.5) * v3857.dy
        X, Y = np.meshgrid(xs, ys)
        lon, lat = srs.webmercator_to_geodetic(X, Y)
        want = np.full((ny, nx), np.nan)
        for i in range(2):
            p = lay.params(i)
            px_all = ((lon - p["left"]) / ((p["right"] - p["left"]) / 32)).astype(np.int64)
            py_all = ((p["top"] - lat) / ((p["top"] - p["bottom"]) / 32)).astype(np.int64)
            m = (px_all >= 0) & (px_all < 32) & (py_all >= 0) & (py_all < 32)
            vals = lay.pixels(i)[0].astype("float64")
            want[m] = vals[np.clip(py_all, 0, 31), np.clip(px_all, 0, 31)][m]
        assert np.array_equal(a3[0, 0], want)
