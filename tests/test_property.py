"""Property-based tests (hypothesis) over the pure kernels — the fuzzing
layer of the test strategy (SURVEY §5): axis arithmetic, gap-fill, segmented
footprint reductions. No Spark session — every example runs in microseconds.
"""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from gdalcubes_spark.grid import CubeView, Datetime, Duration, Unit
from gdalcubes_spark.operators.window import _fill_series
from gdalcubes_spark.sources.resample import segmented_reduce

UNITS = [("P1D", "2021-01-%02d"), ("P1M", None), ("PT1H", None)]


class TestAxisProperties:
    @given(nt=st.integers(1, 200), n=st.integers(1, 7))
    @settings(max_examples=60, deadline=None)
    def test_index_datetime_roundtrip_days(self, nt, n):
        v = CubeView.create(srs="EPSG:4326", left=0, right=1, bottom=0, top=1,
                            t0="2021-01-01", t1="2021-12-31", dt=f"P{n}D", dx=1.0, dy=1.0)
        for it in (0, min(nt, v.nt - 1), v.nt - 1):
            assert v.index_at_datetime(v.datetime_at_index(it)) == it

    @given(months=st.integers(0, 47), n=st.integers(1, 5))
    @settings(max_examples=60, deadline=None)
    def test_month_arith_consistency(self, months, n):
        d = Datetime.parse("2020-01")
        d2 = d.add(Duration(months, Unit.MONTH))
        assert (d2 - d).n == months
        v = CubeView.create(srs="EPSG:4326", left=0, right=1, bottom=0, top=1,
                            t0="2020-01", t1="2023-12", dt=f"P{n}M", dx=1.0, dy=1.0)
        # axis covers the requested interval completely
        assert (v.t0 - Datetime.parse("2020-01")).n <= 0
        last = v.datetime_at_index(v.nt - 1)
        assert (Datetime.parse("2023-12") - last).n < n

    @given(nt=st.integers(1, 100))
    @settings(max_examples=40, deadline=None)
    def test_nt_from_n_matches_request(self, nt):
        v = CubeView.create(srs="EPSG:4326", left=0, right=1, bottom=0, top=1,
                            t0="2021-01-01", t1="2021-12-31", nt=nt, dx=1.0, dy=1.0)
        assert v.nt == nt  # set_t_axis_n must deliver exactly nt slices


class TestFillSeriesProperties:
    @given(st.lists(st.one_of(st.none(), st.floats(-1e6, 1e6)), min_size=1, max_size=40))
    @settings(max_examples=120, deadline=None)
    def test_against_pandas(self, vals):
        v = np.array([np.nan if x is None else x for x in vals]).reshape(-1, 1)
        s = pd.Series(v[:, 0])
        locf = _fill_series(v, "locf")[:, 0]
        nocb = _fill_series(v, "nocb")[:, 0]
        lin = _fill_series(v, "linear")[:, 0]
        assert np.allclose(np.nan_to_num(locf, nan=-9e9), np.nan_to_num(s.ffill(), nan=-9e9))
        assert np.allclose(np.nan_to_num(nocb, nan=-9e9), np.nan_to_num(s.bfill(), nan=-9e9))
        # linear: interior matches pandas interpolate; one-sided copies edge
        pl = s.interpolate(method="linear", limit_direction="both")
        assert np.allclose(np.nan_to_num(lin, nan=-9e9), np.nan_to_num(pl, nan=-9e9), atol=1e-9)

    @given(st.lists(st.one_of(st.none(), st.floats(-100, 100)), min_size=1, max_size=30))
    @settings(max_examples=60, deadline=None)
    def test_near_tie_prefers_previous(self, vals):
        v = np.array([np.nan if x is None else x for x in vals]).reshape(-1, 1)
        out = _fill_series(v, "near")[:, 0]
        valid_idx = np.nonzero(~np.isnan(v[:, 0]))[0]
        for i in range(len(v)):
            if np.isnan(v[i, 0]):
                if len(valid_idx) == 0:
                    assert np.isnan(out[i])
                    continue
                d = np.abs(valid_idx - i)
                best = d.min()
                cands = valid_idx[d == best]
                pick = cands.min()  # tie → previous (fill_time.cpp near rule)
                assert out[i] == v[pick, 0]
            else:
                assert out[i] == v[i, 0]


class TestSegmentedReduceProperties:
    @given(st.lists(st.tuples(st.integers(0, 9),
                              st.one_of(st.none(), st.floats(-1e3, 1e3))),
                    min_size=0, max_size=200),
           st.sampled_from(["average", "min", "max", "med", "q1", "q3", "mode"]))
    @settings(max_examples=150, deadline=None)
    def test_against_numpy_groupby(self, pairs, method):
        ids = np.array([p[0] for p in pairs], dtype="int64")
        vals = np.array([np.nan if p[1] is None else p[1] for p in pairs])
        got = segmented_reduce(ids, vals, 10, method)
        for cell in range(10):
            grp = vals[(ids == cell) & ~np.isnan(vals)]
            if len(grp) == 0:
                assert np.isnan(got[cell])
                continue
            if method == "average":
                want = grp.mean()
            elif method == "min":
                want = grp.min()
            elif method == "max":
                want = grp.max()
            elif method in ("med", "q1", "q3"):
                q = {"med": 50, "q1": 25, "q3": 75}[method]
                want = np.percentile(grp, q)
            else:  # mode: most frequent, ties → smallest
                uq, cn = np.unique(grp, return_counts=True)
                want = uq[cn == cn.max()].min()
            assert np.isclose(got[cell], want), (cell, method, grp, got[cell], want)
