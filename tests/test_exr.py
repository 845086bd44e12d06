import numpy as np
import pytest

from tpu_pathtracer.io.exr import read_exr, write_exr
from tpu_pathtracer.scene.assets import golden_path


def test_golden_read():
    img, channels = read_exr(golden_path("cornellbox", 8))
    assert img.shape == (600, 800, 3)
    assert channels == ["R", "G", "B"]
    assert np.isfinite(img).all()
    assert 0.0 <= img.min()
    # the light patch is the brightest legitimate content (R radiance 5)
    assert img.max() >= 5.0


@pytest.mark.parametrize("half", [False, True])
@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip(tmp_path, half, compress):
    rng = np.random.default_rng(42)
    img = (rng.random((41, 67, 3)) * 4.0).astype(np.float32)
    path = str(tmp_path / "rt.exr")
    write_exr(path, img, half=half, compress=compress)
    back, channels = read_exr(path)
    assert channels == ["R", "G", "B"]
    tol = 2e-3 if half else 0.0
    assert np.abs(back - img).max() <= tol


def test_roundtrip_tall_not_multiple_of_block(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((33, 8, 3)).astype(np.float32)  # 33 rows: 16+16+1
    path = str(tmp_path / "rt.exr")
    write_exr(path, img, half=False, compress=True)
    back, _ = read_exr(path)
    assert np.array_equal(back, img)
