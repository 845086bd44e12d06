import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.models.camera import Camera, generate_rays


def _rays(h, w, jitter_half=True):
    jitter = jnp.full((h, w, 2), 0.5)  # zero jitter (0.5 -> dudv = 0)
    return generate_rays(Camera.reference_default(), h, w, jitter)


def test_origin_and_center_direction():
    o, d = _rays(101, 101)
    np.testing.assert_allclose(np.asarray(o[0, 0]), [0.0, 1.0, 2.35], atol=1e-6)
    center = np.asarray(d[50, 50])
    np.testing.assert_allclose(center, [0.0, 0.0, -1.0], atol=1e-6)


def test_fov_is_90_degrees_horizontal():
    o, d = _rays(101, 101)
    left = np.asarray(d[50, 0])
    # ncx = -1 at x=0 -> direction (-1, 0, -1)/sqrt(2): 45 degrees off axis
    np.testing.assert_allclose(left, [-1, 0, -1] / np.sqrt(2), atol=1e-6)


def test_aspect_and_vertical_orientation():
    h, w = 51, 101
    o, d = _rays(h, w)
    top = np.asarray(d[0, 50])       # row 0 = top of image
    bottom = np.asarray(d[h - 1, 50])
    assert top[1] > 0 and bottom[1] < 0  # top row looks up
    aspect = h / w
    expected_y = aspect / np.sqrt(aspect**2 + 1)
    np.testing.assert_allclose(top, [0, expected_y, -np.sqrt(1 - expected_y**2)], atol=1e-6)


def test_unit_directions():
    _, d = _rays(33, 65)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-6
    )
