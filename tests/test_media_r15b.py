"""Round-15b media codecs: progressive JPEG (T.81 Annex G — spectral
selection + successive approximation + EOB runs) and MJPEG-in-AVI video
sample decode. The ground truth for progressive decode is the baseline
codec over the same quantized coefficients: after the 4-scan successive
approximation completes, the accumulated coefficients must be identical,
so the decoded pixels must match bit-for-bit.

Reference parity note: modin has no media operators — this surface is
net-new for the training-data-pipeline layer (SURVEY.md multimodal rows).
"""

import numpy as np
import pytest

from modin_spark.operators import media_codecs as mc

Q8 = np.full((8, 8), 8, dtype=np.int64)


def _roundtrip(coeffs, w, h):
    base = mc.decode_jpeg_baseline(mc.encode_jpeg_baseline(coeffs, w, h, Q8))
    prog = mc.decode_jpeg(mc.encode_jpeg_progressive(coeffs, w, h, Q8))
    np.testing.assert_array_equal(base, prog)
    return prog


class TestProgressiveJpeg:
    def test_random_grids_match_baseline(self):
        rng = np.random.default_rng(11)
        for _ in range(15):
            by, bx = rng.integers(1, 4, 2)
            c = rng.choice(
                [0, 0, 0, 0, 0, 1, -1, 2, -2, 3, -3, 7, -9, 15, 30, -25],
                size=(by, bx, 8, 8)).astype(np.int64)
            c[..., 0, 0] = rng.integers(-40, 40, (by, bx))
            _roundtrip(c, bx * 8, by * 8)

    def test_all_zero_blocks_pure_eob_runs(self):
        c = np.zeros((4, 4, 8, 8), dtype=np.int64)
        out = _roundtrip(c, 32, 32)
        assert (out == 128).all()

    def test_new_coef_at_last_zigzag_position(self):
        c = np.zeros((2, 2, 8, 8), dtype=np.int64)
        c[:, :, 7, 7] = [[1, -1], [1, -1]]
        _roundtrip(c, 16, 16)

    def test_zrl_with_deferred_correction_bits(self):
        # history coef inside a >16-zero run before a new coef: the decoder
        # stops its ZRL walk after 16 zeros, so correction bits must be
        # flushed at each ZRL boundary (the libjpeg ordering)
        nat = np.zeros(64, dtype=np.int64)
        nat[mc._JPEG_ZIGZAG[21]] = -7
        nat[mc._JPEG_ZIGZAG[45]] = 1
        nat[mc._JPEG_ZIGZAG[0]] = 3
        c = np.zeros((1, 1, 8, 8), dtype=np.int64)
        c[0, 0] = nat.reshape(8, 8)
        _roundtrip(c, 8, 8)

    def test_history_tail_after_last_new_coef(self):
        nat = np.zeros(64, dtype=np.int64)
        nat[mc._JPEG_ZIGZAG[5]] = 1
        nat[mc._JPEG_ZIGZAG[30]] = 9
        nat[mc._JPEG_ZIGZAG[60]] = -5
        c = np.zeros((1, 2, 8, 8), dtype=np.int64)
        c[0, 0] = nat.reshape(8, 8)
        _roundtrip(c, 16, 8)

    def test_sparse_many_blocks_aggregated_eob(self):
        c = np.zeros((8, 8, 8, 8), dtype=np.int64)
        c[3, 3, 0, 1] = 1
        c[7, 7, 2, 2] = -9
        _roundtrip(c, 64, 64)

    def test_odd_values_every_refinement_bit_set(self):
        c = np.full((2, 3, 8, 8), 3, dtype=np.int64)
        _roundtrip(c, 24, 16)

    def test_partial_edge_blocks(self):
        rng = np.random.default_rng(3)
        c = rng.choice([0] * 8 + [1, -1, 4, -6], size=(3, 2, 8, 8)).astype(np.int64)
        _roundtrip(c, 13, 21)

    def test_meta_flags_progressive(self):
        c = np.zeros((1, 1, 8, 8), dtype=np.int64)
        data = mc.encode_jpeg_progressive(c, 8, 8, Q8)
        meta = mc.jpeg_meta(data)
        assert meta["progressive"] is True
        assert (meta["width"], meta["height"]) == (8, 8)

    def test_baseline_decoder_rejects_progressive(self):
        c = np.zeros((1, 1, 8, 8), dtype=np.int64)
        data = mc.encode_jpeg_progressive(c, 8, 8, Q8)
        with pytest.raises(NotImplementedError):
            mc.decode_jpeg_baseline(data)


class TestAviMjpeg:
    def _make(self, n_frames=6, alternate=True):
        frames, pix = [], []
        for f in range(n_frames):
            c = np.zeros((2, 2, 8, 8), dtype=np.int64)
            c[..., 0, 0] = f * 3 - 5
            enc = (mc.encode_jpeg_progressive
                   if alternate and f % 2 else mc.encode_jpeg_baseline)
            frames.append(enc(c, 16, 16, Q8))
            pix.append(mc.decode_jpeg_baseline(
                mc.encode_jpeg_baseline(c, 16, 16, Q8)))
        return mc.encode_avi_mjpeg(frames, 16, 16, fps=10), pix

    def test_meta(self):
        avi, _ = self._make()
        meta = mc.avi_meta(avi)
        assert meta["codec"] == "MJPG"
        assert (meta["width"], meta["height"], meta["n_frames"]) == (16, 16, 6)
        assert meta["fps"] == 10

    def test_frame_sampling_exact_pixels(self):
        avi, pix = self._make()
        out = dict(mc.decode_avi_frames(avi, every_n=2))
        assert sorted(out) == [0, 2, 4]
        for i, arr in out.items():
            np.testing.assert_array_equal(arr, pix[i])

    def test_all_frames(self):
        avi, pix = self._make(n_frames=3, alternate=False)
        out = list(mc.decode_avi_frames(avi))
        assert [i for i, _ in out] == [0, 1, 2]

    def test_max_frames_cap(self):
        avi, _ = self._make()
        out = list(mc.decode_avi_frames(avi, every_n=1, max_frames=2))
        assert len(out) == 2

    def test_non_mjpeg_raises(self):
        avi, _ = self._make(n_frames=2)
        bad = avi.replace(b"vidsMJPG", b"vidsH264")
        with pytest.raises(NotImplementedError):
            list(mc.decode_avi_frames(bad))

    def test_not_avi_raises(self):
        with pytest.raises(ValueError):
            mc.avi_meta(b"\x00" * 32)


class TestVideoSparkOps:
    def test_video_frame_stats(self, spark):
        from modin_spark.operators.multimodal import video_frame_stats

        frames = []
        for f in range(4):
            c = np.zeros((2, 2, 8, 8), dtype=np.int64)
            c[..., 0, 0] = f + 1
            frames.append(mc.encode_jpeg_baseline(c, 16, 16, Q8))
        avi = mc.encode_avi_mjpeg(frames, 16, 16, fps=5)
        df = spark.createDataFrame([(1, bytearray(avi))], "vid int, payload binary")
        row = video_frame_stats(df, every_n=2).collect()[0]
        assert (row.width, row.height, row.n_frames, row.sampled) == (16, 16, 4, 2)
        # sampled frames 0 and 2 have constant dc 1 and 3 -> mean 128 + 2
        assert row.mean_lum == 130.0

    def test_sample_frames_real(self, spark):
        from modin_spark.operators.multimodal import sample_frames

        frames = []
        for f in range(5):
            c = np.zeros((1, 1, 8, 8), dtype=np.int64)
            c[0, 0, 0, 0] = f * 2
            frames.append(mc.encode_jpeg_baseline(c, 8, 8, Q8))
        avi = mc.encode_avi_mjpeg(frames, 8, 8, fps=5)
        df = spark.createDataFrame([(7, bytearray(avi))], "vid int, payload binary")
        rows = sample_frames(df, every_n=2, decode_stub=False).collect()
        assert sorted(r.frame_idx for r in rows) == [0, 2, 4]
        for r in rows:
            arr = mc.decode_png(bytes(r.frame_payload))
            expect = mc.decode_jpeg_baseline(frames[r.frame_idx])
            np.testing.assert_array_equal(arr[:, :, 0], expect)
