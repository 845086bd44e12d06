"""Fail-fast guards: config validation and the sort compile-wall check."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.render import wavefront as wf


def test_config_string_knobs_validated():
    for field, bad in [("occlusion_anyhit", "true"), ("tritest", "BW"),
                       ("traversal_kernel", "v2"), ("sampler", "halton"),
                       ("intersector", "mps")]:
        with pytest.raises(ValueError):
            RenderConfig(**{field: bad})
    RenderConfig()  # defaults pass


def test_sort_operand_wall_guard(monkeypatch):
    """S=8 full-spectral sorted wavefront must fail fast on TPU-family
    backends instead of hanging the compile for hours."""
    n, s = 8, 8
    st = wf.initial_path_state(
        jnp.zeros((3, n)), jnp.ones((3, n)) / np.sqrt(3.0), s)
    pack = wf.ShadowPack(
        to_light=jnp.zeros((3, n)), cap=jnp.ones((n,)),
        target=jnp.zeros((n,), jnp.int32), contrib=jnp.zeros((s, n)),
        ok=jnp.zeros((n,), bool))
    wmin = (0.0, 0.0, 0.0)
    winv = (1.0, 1.0, 1.0)
    monkeypatch.setattr(wf.jax, "default_backend", lambda: "tpu")
    with pytest.raises(RuntimeError, match="lax.sort operands"):
        wf.sort_wavefront(st, wmin, winv, pack)
    monkeypatch.undo()
    # S=3 stays under the wall and sorts fine (real backend: CPU)
    st3 = wf.initial_path_state(
        jnp.zeros((3, n)), jnp.ones((3, n)) / np.sqrt(3.0), 3)
    out = wf.sort_wavefront(st3, wmin, winv)
    assert out.origin.shape == (3, n)
