"""Native C++ PNG decoder: build, decode, parity with OpenCV."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from rgbd_pose_estimation_tpu.data.native_loader import (
    decode_depth16,
    decode_gray8,
    native_available,
)


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    d = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    depth = rng.integers(0, 30000, size=(48, 64), dtype=np.uint16)
    rgb = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    gray = rng.integers(0, 255, size=(48, 64), dtype=np.uint8)
    dp = str(d / "depth.png")
    cp = str(d / "rgb.png")
    gp = str(d / "gray.png")
    cv2.imwrite(dp, depth)
    cv2.imwrite(cp, rgb)
    cv2.imwrite(gp, gray)
    return dp, cp, gp, depth, rgb, gray


class TestNativeLoader:
    def test_native_builds(self):
        assert native_available(), "g++/libpng build failed"

    def test_depth16_exact(self, pngs):
        dp, _, _, depth, _, _ = pngs
        out = decode_depth16(dp)
        np.testing.assert_array_equal(out, depth)

    def test_gray8_from_gray_exact(self, pngs):
        _, _, gp, _, _, gray = pngs
        out = decode_gray8(gp)
        np.testing.assert_array_equal(out, gray)

    def test_gray8_from_rgb_close_to_cv2(self, pngs):
        _, cp, _, _, rgb, _ = pngs
        out = decode_gray8(cp)
        ref = cv2.cvtColor(cv2.imread(cp), cv2.COLOR_BGR2GRAY)
        # Different luma rounding conventions: allow ±2 levels.
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 2

    def test_missing_file_raises(self):
        if not native_available():
            pytest.skip("native lib unavailable")
        with pytest.raises(IOError):
            decode_depth16("/nonexistent/never.png")


class TestNativePrefetcher:
    """The C++ ring-buffer decode pool (ABI v2 rgbd_loader_*)."""

    def _make_seq(self, tmp_path, n=10, size=(96, 72)):
        from rgbd_pose_estimation_tpu.data.tum import TumSequence, write_synthetic_tum

        root = str(tmp_path / "tum")
        write_synthetic_tum(root, n_frames=n, size=size)
        return TumSequence(root)

    def test_matches_sequential_decode(self, tmp_path):
        from rgbd_pose_estimation_tpu.data.prefetch import sequence_prefetcher

        seq = self._make_seq(tmp_path)
        got = list(sequence_prefetcher(seq, 0, len(seq)))
        assert len(got) == len(seq)
        for i in range(len(seq)):
            ts, g, d = seq.frame(i)
            assert got[i][0] == ts
            np.testing.assert_array_equal(got[i][1], g)
            np.testing.assert_array_equal(got[i][2], d)

    def test_start_offset(self, tmp_path):
        from rgbd_pose_estimation_tpu.data.prefetch import sequence_prefetcher

        seq = self._make_seq(tmp_path, n=8)
        got = list(sequence_prefetcher(seq, 3, 4))
        assert len(got) == 4
        ts, g, d = seq.frame(5)
        np.testing.assert_array_equal(got[2][2], d)

    def test_many_threads_small_queue_ordered(self, tmp_path):
        """More workers than slots exercises the ring back-pressure path."""
        if not native_available():
            pytest.skip("native lib unavailable")
        import os

        from rgbd_pose_estimation_tpu.data.native_loader import NativePrefetcher

        seq = self._make_seq(tmp_path, n=16)
        rgb = [os.path.join(seq.root, f) for f in seq.rgb_files]
        dep = [os.path.join(seq.root, f) for f in seq.depth_files]
        with NativePrefetcher(rgb, dep, 96, 72, queue_depth=2, n_threads=8) as pf:
            idxs = [i for i, _, _ in pf]
        assert idxs == list(range(16))

    def test_decode_error_surfaces(self, tmp_path):
        if not native_available():
            pytest.skip("native lib unavailable")
        from rgbd_pose_estimation_tpu.data.native_loader import NativePrefetcher

        with NativePrefetcher(
            ["/nonexistent/a.png"], ["/nonexistent/b.png"], 8, 8
        ) as pf:
            with pytest.raises(IOError):
                pf.next()

    def test_raw_icl_falls_back_to_python_path(self, tmp_path):
        from rgbd_pose_estimation_tpu.data.icl_nuim import (
            IclNuimSequence,
            write_synthetic_icl,
        )
        from rgbd_pose_estimation_tpu.data.prefetch import sequence_prefetcher

        root = str(tmp_path / "icl")
        cam = write_synthetic_icl(root, n_frames=3, size=(64, 48))
        seq = IclNuimSequence(root, cam)
        got = list(sequence_prefetcher(seq, 0, 3))
        assert len(got) == 3
        _, _, d = seq.frame(1)
        np.testing.assert_array_equal(got[1][2], d)
