import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.models.camera import Camera, generate_rays


def _rays(h, w):
    jitter = jnp.full((2, h * w), 0.5)  # zero jitter (0.5 -> dudv = 0)
    o, d = generate_rays(Camera.reference_default(), h, w, jitter)
    return np.asarray(o), np.asarray(d)  # (3, N) each, row-major lanes


def _at(a, h, w, r, c):
    return a[:, r * w + c]


def test_origin_and_center_direction():
    o, d = _rays(101, 101)
    np.testing.assert_allclose(_at(o, 101, 101, 0, 0), [0.0, 1.0, 2.35], atol=1e-6)
    np.testing.assert_allclose(_at(d, 101, 101, 50, 50), [0.0, 0.0, -1.0], atol=1e-6)


def test_fov_is_90_degrees_horizontal():
    _, d = _rays(101, 101)
    # ncx = -1 at x=0 -> direction (-1, 0, -1)/sqrt(2): 45 degrees off axis
    np.testing.assert_allclose(
        _at(d, 101, 101, 50, 0), np.array([-1, 0, -1]) / np.sqrt(2), atol=1e-6
    )


def test_aspect_and_vertical_orientation():
    h, w = 51, 101
    _, d = _rays(h, w)
    top = _at(d, h, w, 0, 50)        # row 0 = top of image
    bottom = _at(d, h, w, h - 1, 50)
    assert top[1] > 0 and bottom[1] < 0  # top row looks up
    aspect = h / w
    expected_y = aspect / np.sqrt(aspect**2 + 1)
    np.testing.assert_allclose(
        top, [0, expected_y, -np.sqrt(1 - expected_y**2)], atol=1e-6
    )


def test_unit_directions():
    _, d = _rays(33, 65)
    np.testing.assert_allclose(np.linalg.norm(d, axis=0), 1.0, atol=1e-6)
