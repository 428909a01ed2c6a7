"""Regression tests for round-5 ADVICE fixes (webpcodec mode-13 halving,
short-distance plane guard, webp decode band pinning)."""
import numpy as np
import pytest

from gdalcubes_spark import codecs
from gdalcubes_spark import webpcodec as W


def _grey_px(g: int) -> np.uint32:
    return np.uint32((g << 24) | (g << 16) | (g << 8) | g)


class TestMode13TruncHalving:
    def test_mode_predictions_truncates_toward_zero(self):
        # At (1,1): L=T=10 → ave=10, TL=15. libwebp: 10 + trunc((10-15)/2)
        # = 10 + (-2) = 8. Floor-shift halving would give 7.
        img = np.array([[_grey_px(15), _grey_px(10)],
                        [_grey_px(10), _grey_px(0)]], dtype=np.uint32)
        preds = W._mode_predictions(img)
        assert int(preds[13, 1, 1, 3]) == 8  # low byte channel
        assert int(preds[13, 1, 1, 0]) == 8  # alpha channel too

    def test_mode_predictions_positive_diff_unchanged(self):
        # ave=15, TL=10 → 15 + trunc(2.5) = 17 (floor and trunc agree).
        img = np.array([[_grey_px(10), _grey_px(15)],
                        [_grey_px(15), _grey_px(0)]], dtype=np.uint32)
        preds = W._mode_predictions(img)
        assert int(preds[13, 1, 1, 3]) == 17

    def test_forced_mode13_roundtrip(self, monkeypatch):
        # Force every tile to predictor mode 13 so the decoder's inline
        # scalar halving is exercised against the encoder's vectorized one
        # on noise (plenty of odd negative differences). Any floor/trunc
        # mismatch desyncs the chained predictions and breaks exactness.
        rng = np.random.default_rng(135)
        a = rng.integers(0, 256, size=(3, 48, 40), dtype=np.uint8)
        orig = W._select_predictor_modes

        def all13(img, bits):
            return np.full_like(orig(img, bits), 13)

        monkeypatch.setattr(W, "_select_predictor_modes", all13)
        enc = W.encode_vp8l(a, transform="predictor")
        out = W.decode_vp8l(enc)
        assert np.array_equal(out[1:], a)  # ARGB → compare RGB planes


class TestDistPlaneGuard:
    def test_dx8_codes_now_emitted(self):
        # dist = 8 on a wide image is short-distance code (dx=8, dy=0).
        xs = 64
        for dy in range(0, 8):
            dist = dy * xs + 8
            code = W._dist_to_plane(dist, xs)
            assert code <= 120, f"(8,{dy}) should map to a plane code"
            assert W._plane_to_dist(code, xs) == dist

    def test_all_map_entries_roundtrip(self):
        xs = 100
        for i, (dx, dy) in enumerate(W._DIST_MAP):
            dist = dy * xs + dx
            if dist < 1:
                continue
            code = W._dist_to_plane(dist, xs)
            assert code == i + 1
            assert W._plane_to_dist(code, xs) == dist

    def test_out_of_window_falls_back(self):
        assert W._dist_to_plane(9, 1000) == 9 + 120  # dx=9 → literal
        assert W._plane_to_dist(9 + 120, 1000) == 9


class TestWebpBandPinning:
    def test_nb_pins_grey_as_rgb(self):
        g = np.full((1, 8, 8), 77, dtype=np.uint8)
        b = codecs.encode(np.repeat(g, 3, axis=0), "webp")
        # default collapse folds equal channels to 1 band
        assert codecs.decode(b, "webp").shape[0] == 1
        out = codecs.decode(b, "webp", nb=3)
        assert out.shape[0] == 3
        assert np.array_equal(out, np.repeat(g, 3, axis=0))

    def test_nb_pins_opaque_argb(self):
        rng = np.random.default_rng(7)
        rgb = rng.integers(0, 256, size=(3, 8, 8), dtype=np.uint8)
        b = codecs.encode(rgb, "webp")
        out4 = codecs.decode(b, "webp", nb=4)
        assert out4.shape[0] == 4
        assert (out4[0] == 255).all()
        assert np.array_equal(out4[1:], rgb)

    def test_nb_invalid(self):
        b = codecs.encode(np.zeros((1, 4, 4), dtype=np.uint8), "webp")
        with pytest.raises(ValueError):
            codecs.decode(b, "webp", nb=2)


class TestQualityPoolProbe:
    def test_known_mse(self, spark):
        from gdalcubes_spark.pipeline.multimodal import quality_pool_probe
        # band 0: [[0,2],[4,6]] tiled — each 2x2 block mean is 3, diffs
        # (-3,-1,1,3) → mse = (9+1+1+9)/4 = 5.0
        a = np.tile(np.array([[0, 2], [4, 6]], dtype=np.uint8), (4, 4))[None]
        df = spark.createDataFrame(
            [("i0", bytearray(codecs.encode(a, "raw")), "raw")],
            "image_id string, bytes binary, fmt string")
        rows = quality_pool_probe(df, factor=2).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["band"] == 0
        assert r["mse"] == 5.0
        assert abs(r["psnr"] - round(10 * np.log10(255.0 ** 2 / 5.0), 6)) < 1e-9

    def test_constant_image_psnr_cap(self, spark):
        from gdalcubes_spark.pipeline.multimodal import quality_pool_probe
        a = np.full((2, 8, 8), 42, dtype=np.uint8)
        df = spark.createDataFrame(
            [("i0", bytearray(codecs.encode(a, "raw")), "raw")],
            "image_id string, bytes binary, fmt string")
        rows = {r["band"]: r for r in quality_pool_probe(df, factor=2).collect()}
        assert set(rows) == {0, 1}
        for r in rows.values():
            assert r["mse"] == 0.0 and r["psnr"] == 99.0


class TestStreamingStateBounding:
    def test_phash_lru_cap_retention_window(self, spark, tmp_path):
        """max_state caps bucket state at the most-recent entries: a probe
        arriving after older entries were evicted pairs ONLY against the
        retention window (ids 3..6), never the evicted ids 1..2."""
        import pyspark.sql.functions as F
        from gdalcubes_spark.streaming import streaming_phash_dedup

        src = str(tmp_path / "sigs")
        ph = 0x0F0F0F0F0F0F0F  # identical phash → same bucket in every band
        batch1 = spark.createDataFrame([(i, ph) for i in range(1, 7)], "id long, phash long").coalesce(1)
        batch1.write.mode("overwrite").parquet(src)
        spark.createDataFrame([(100, ph)], "id long, phash long").write.mode("append").parquet(src)

        stream = (spark.readStream.schema("id long, phash long")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = streaming_phash_dedup(stream, id_col="id", max_hamming=4,
                                    sig_bits=60, max_state=4)
        q = (out.writeStream.format("memory").queryName("lru_phash")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        probe_pairs = {r["ida"] for r in spark.sql(
            "SELECT DISTINCT ida FROM lru_phash WHERE idb = 100").collect()}
        assert probe_pairs == {3, 4, 5, 6}

    def test_phash_ttl_plumbs_through(self, spark, tmp_path):
        """A long TTL (nothing expires during the run) must not change the
        emitted pairs — the ProcessingTimeTimeout wiring is exercised end to
        end (setTimeoutDuration on every update)."""
        from gdalcubes_spark.streaming import streaming_phash_dedup
        import pyspark.sql.functions as F

        src = str(tmp_path / "sigs_ttl")
        d = spark.range(40)
        h = F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 15), 16, 10).cast("long")
        base = d.select("id", h.alias("phash"))
        clones = base.select((F.col("id") + 500000).alias("id"), "phash")
        base.write.mode("overwrite").parquet(src)
        clones.write.mode("append").parquet(src)

        stream = (spark.readStream.schema("id long, phash long")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = streaming_phash_dedup(stream, id_col="id", max_hamming=4,
                                    sig_bits=60, ttl="30 minutes")
        # ttl registers processing-time timeouts, which AvailableNow can
        # only fire by busy-looping empty batches until they expire — so
        # run under the trigger ttl is FOR (see the caveat in streaming.py)
        # and poll the sink until the expected pairs land.
        import time
        q = (out.writeStream.format("memory").queryName("ttl_phash")
             .outputMode("append").trigger(processingTime="1 second")
             .start())
        want = {(i, i + 500000) for i in range(40)}
        got = set()
        deadline = time.time() + 120
        try:
            while time.time() < deadline and got != want:
                time.sleep(2)
                got = {(r["ida"], r["idb"]) for r in spark.sql(
                    "SELECT DISTINCT ida, idb FROM ttl_phash").collect()}
        finally:
            q.stop()
            q.awaitTermination(60)
        assert got == want

    def test_embed_lru_cap_retention_window(self, spark, tmp_path):
        """Same retention contract for the embedding near-dup: identical
        vectors land in one bucket per table; with max_state=3 a late probe
        pairs only against the last three arrivals."""
        from gdalcubes_spark.streaming import streaming_embed_neardup

        vec = [1.0, 2.0, 3.0, 4.0]
        src = str(tmp_path / "emb")
        b1 = spark.createDataFrame([(i, vec) for i in range(1, 6)],
                                   "vec_id long, embedding array<double>").coalesce(1)
        b1.write.mode("overwrite").parquet(src)
        spark.createDataFrame([(100, vec)], "vec_id long, embedding array<double>") \
            .write.mode("append").parquet(src)

        stream = (spark.readStream.schema("vec_id long, embedding array<double>")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        out = streaming_embed_neardup(stream, threshold=0.999, max_state=3)
        q = (out.writeStream.format("memory").queryName("lru_emb")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        probe_pairs = {r["ida"] for r in spark.sql(
            "SELECT DISTINCT ida FROM lru_emb WHERE idb = 100").collect()}
        assert probe_pairs == {3, 4, 5}


class TestReviewPassBandContract:
    """Second review pass: one shared _pin_bands contract across every
    decoder (the per-codec copies had already drifted — the VP8 branch
    silently returned 3 bands for invalid nb)."""

    def test_vp8_invalid_nb_raises(self):
        import sys
        sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
        from vp8_writer import checkerboard_dc, write_stream

        from gdalcubes_spark import codecs
        b = write_stream(2, 2, dc_plan=checkerboard_dc(8))
        assert codecs.decode(b, "webp", nb=3).shape[0] == 3
        with pytest.raises(ValueError, match="nb must be 1, 3 or 4"):
            codecs.decode(b, "webp", nb=2)

    def test_invalid_nb_raises_everywhere(self):
        from gdalcubes_spark import codecs
        grey = np.arange(16, dtype=np.uint8).reshape(1, 4, 4) * 15
        for fmt in ("webp", "gif", "bmp"):
            blob = codecs.encode(grey, fmt)
            with pytest.raises(ValueError, match="nb must be 1, 3 or 4"):
                codecs.decode(blob, fmt, nb=2)

    def test_bmp_bitfields_default_masks_decode(self):
        import struct

        from gdalcubes_spark import codecs
        a = np.arange(2 * 2 * 4, dtype=np.uint8).reshape(4, 2, 2)
        # hand-build a 32-bit BI_BITFIELDS file with the default BGRA masks
        inter = np.stack([a[3], a[2], a[1], a[0]], axis=-1)  # BGRA rows
        pix = inter[::-1].tobytes()  # bottom-up
        masks = struct.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF)
        off = 14 + 40 + len(masks)
        hdr = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
        info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 32, 3, len(pix),
                           2835, 2835, 0, 0)
        out = codecs.decode(hdr + info + masks + pix, "bmp", nb=4)
        np.testing.assert_array_equal(out, a)

    def test_bmp_bitfields_swapped_masks_raise(self):
        import struct

        from gdalcubes_spark import codecs
        pix = bytes(16)
        masks = struct.pack("<III", 0x000000FF, 0x0000FF00, 0x00FF0000)
        off = 14 + 40 + len(masks)
        hdr = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
        info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 32, 3, len(pix),
                           2835, 2835, 0, 0)
        with pytest.raises(NotImplementedError, match="BI_BITFIELDS"):
            codecs.decode(hdr + info + masks + pix, "bmp")


class TestReviewPassAnimation:
    def test_anmf_without_vp8x_fails_fast(self):
        from gdalcubes_spark import codecs
        # a container whose only chunk is an ANMF: must raise BEFORE any
        # frame decode (the old fallback decoded everything, then raised)
        anmf = bytes(16) + b"VP8L\x00\x00\x00\x00"
        body = b"WEBP" + b"ANMF" + len(anmf).to_bytes(4, "little") + anmf
        blob = b"RIFF" + len(body).to_bytes(4, "little") + body
        with pytest.raises(ValueError, match="without a VP8X"):
            codecs.webp_decode_frames(blob)

    def test_gif_max_frames_stops_decoding_true_count_reported(self):
        from gdalcubes_spark import codecs
        from gdalcubes_spark.gifcodec import encode_gif_animation
        frames = [(np.full((1, 8, 8), 20 * i, np.uint8), 5)
                  for i in range(10)]
        blob = encode_gif_animation(frames)
        decoded, durs = codecs.decode_frames(blob, "gif", max_frames=3)
        assert len(decoded) == 3 and len(durs) == 3
        assert codecs.count_frames(blob, "gif") == 10

    def test_webp_animation_count_and_cap(self):
        from gdalcubes_spark import codecs
        frames = [np.full((3, 8, 8), 30 * i, np.uint8) for i in range(5)]
        blob = codecs.webp_encode_animation(frames, [10] * 5)
        assert codecs.count_frames(blob, "webp") == 5
        decoded, _ = codecs.webp_decode_frames(blob, max_frames=2)
        assert len(decoded) == 2
        # still image counts 1
        still = codecs.encode(frames[0], "webp")
        assert codecs.count_frames(still, "webp") == 1

    def test_sample_animation_frames_reports_true_n_frames(self, spark):
        import pandas as pd

        from gdalcubes_spark.gifcodec import encode_gif_animation
        from gdalcubes_spark.pipeline.multimodal import \
            sample_animation_frames
        blob = encode_gif_animation(
            [(np.full((1, 8, 8), 20 * i, np.uint8), 5) for i in range(10)])
        inv = spark.createDataFrame(
            pd.DataFrame([dict(image_id="g", bytes=blob, fmt="gif")]))
        out = sample_animation_frames(inv, max_frames=4).toPandas()
        assert len(out) == 4
        assert set(out["n_frames"]) == {10}  # TRUE length, not the cap
        assert out["frame_idx"].max() == 3
