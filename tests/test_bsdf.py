import jax
import jax.numpy as jnp
import numpy as np

from tpu_pathtracer.config import PI
from tpu_pathtracer.core.math3d import dot, reflect
from tpu_pathtracer.models import bsdf

N_UP = jnp.array([[0.0], [0.0], [1.0]])


def test_fresnel_normal_incidence():
    # R0 = ((n1-n2)/(n1+n2))^2
    i = jnp.array([[0.0], [0.0], [1.0]])
    got = float(bsdf.fresnel(N_UP, i, 1.0, 1.5)[0])
    assert np.isclose(got, ((1.0 - 1.5) / (1.0 + 1.5)) ** 2, rtol=1e-5)


def test_fresnel_grazing_and_tir():
    # grazing incidence -> ~1
    i = jnp.array([[1.0], [0.0], [1e-4]])
    i = i / jnp.linalg.norm(i)
    assert float(bsdf.fresnel(N_UP, i, 1.0, 1.5)[0]) > 0.99
    # total internal reflection going from dense to sparse past critical angle
    i = jnp.array([[0.9], [0.0], [np.sqrt(1 - 0.81)]])
    assert float(bsdf.fresnel(N_UP, i, 1.5, 1.0)[0]) == 1.0


def test_reflect_matches_metal_semantics():
    i = jnp.array([[1.0], [0.0], [-1.0]]) / np.sqrt(2.0)  # incoming, toward surface
    r = reflect(i, N_UP)
    assert np.allclose(
        np.asarray(r), np.array([[1.0], [0.0], [1.0]]) / np.sqrt(2), atol=1e-6
    )


def _scalar_eval(mtype, ior, w_i, w_o, lobe_u):
    out = bsdf.eval_material(
        jnp.int32(mtype), jnp.float32(ior),
        jnp.asarray(w_i, jnp.float32).reshape(3, 1),
        jnp.asarray(w_o, jnp.float32).reshape(3, 1), N_UP,
        jnp.float32(lobe_u), 3.807693583e-5,
    )
    return float(out[0][0]), float(out[1][0])


def test_eval_diffuse():
    w_o = np.array([0.0, 0.6, 0.8], np.float32)
    b, p = _scalar_eval(bsdf.MATERIAL_DIFFUSE, 0.0, [0, 0, -1], w_o, 0.5)
    assert np.isclose(b, 0.8 / PI, rtol=1e-5)
    assert b == p  # reference quirk: bsdf == pdf for the diffuse lobe


def test_eval_mirror_only_in_mirror_direction():
    w_i = np.array([1.0, 0.0, -1.0], np.float32) / np.sqrt(2)
    w_mirror = np.array([1.0, 0.0, 1.0], np.float32) / np.sqrt(2)
    b, p = _scalar_eval(bsdf.MATERIAL_MIRROR, 0.0, w_i, w_mirror, 0.5)
    assert np.isclose(b, w_mirror[2], rtol=1e-5) and p == 1.0
    b, p = _scalar_eval(bsdf.MATERIAL_MIRROR, 0.0, w_i, [0.0, 0.6, 0.8], 0.5)
    assert b == 0.0 and p == 1.0


def test_eval_dielectric_transmission_is_zero():
    # lobe_u above fresnel -> transmission branch -> bsdf = pdf = 0
    w_i = np.array([0.0, 0.0, -1.0], np.float32)
    b, p = _scalar_eval(bsdf.MATERIAL_SMOOTH_DIELECTRIC, 1.5, w_i, [0, 0.6, 0.8], 0.99)
    assert b == 0.0 and p == 0.0


def test_sample_bounce_mirror():
    w_i = jnp.array([[1.0], [0.0], [-1.0]]) / np.sqrt(2.0)
    w_o, b, p, ior, _ = bsdf.sample_bounce(
        jnp.int32(bsdf.MATERIAL_MIRROR), jnp.float32(0.0), w_i, N_UP,
        jnp.float32(0.5), jnp.array([[0.3], [0.7]]), jnp.float32(1.00029),
    )
    assert np.allclose(np.asarray(w_o), np.asarray(reflect(w_i, N_UP)), atol=1e-6)
    assert float(p[0]) == 1.0
    assert np.isclose(float(b[0]), float(dot(w_o, N_UP)[0]), rtol=1e-6)
    assert float(ior[0]) == np.float32(1.00029)


def test_sample_bounce_dielectric_transmission_passes_straight_through():
    w_i = jnp.array([[0.0], [0.6], [-0.8]])
    # lobe_u = 1.0 > fresnel -> transmit
    w_o, b, p, ior, _ = bsdf.sample_bounce(
        jnp.int32(bsdf.MATERIAL_SMOOTH_DIELECTRIC), jnp.float32(1.5), w_i, N_UP,
        jnp.float32(1.0), jnp.array([[0.3], [0.7]]), jnp.float32(1.00029),
    )
    assert np.allclose(np.asarray(w_o), np.asarray(w_i))  # no refraction bend
    assert float(b[0]) == 1.0 and float(p[0]) == 1.0
    assert float(ior[0]) == 1.5  # enters the medium


def test_sample_bounce_plastic_lobes():
    w_i = jnp.array([[0.0], [0.0], [-1.0]])
    # fresnel at normal incidence for ior 1.5 is ~0.04: u=0.5 -> diffuse lobe
    w_o, b, p, _, _ = bsdf.sample_bounce(
        jnp.int32(bsdf.MATERIAL_SMOOTH_PLASTIC), jnp.float32(1.5), w_i, N_UP,
        jnp.float32(0.5), jnp.array([[0.3], [0.7]]), jnp.float32(1.0),
    )
    assert float(w_o[2, 0]) > 0.0  # upper hemisphere
    assert np.isclose(float(b[0]), float(w_o[2, 0]) / PI, rtol=1e-5)
    # u=0.01 < fresnel -> specular lobe
    w_o2, b2, p2, _, _ = bsdf.sample_bounce(
        jnp.int32(bsdf.MATERIAL_SMOOTH_PLASTIC), jnp.float32(1.5), w_i, N_UP,
        jnp.float32(0.01), jnp.array([[0.3], [0.7]]), jnp.float32(1.0),
    )
    assert np.allclose(np.asarray(w_o2), np.asarray(reflect(w_i, N_UP)), atol=1e-6)
    assert float(p2[0]) == 1.0
