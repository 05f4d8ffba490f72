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
