"""Render statistics: honest traced-ray accounting.

The reference HUD divides dispatch size by frame time
(reference: renderer/Renderer.mm:631-637), which under-reports work by the
bounce count and over-reports it by the dead-ray fraction.  This module counts
rays the traversal actually processes (path rays alive at each bounce + active
shadow rays), probed at reduced resolution and scaled.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..models.camera import Camera, generate_rays_flat
from ..render.noise import bounce_uniforms, camera_jitter, pids_from_order
from ..render.order import make_order
from ..render.wavefront import (
    initial_path_state,
    make_brute_intersector,
    trace_bounce,
)
from ..scene.scene import Scene


@partial(jax.jit, static_argnames=("cfg", "height", "width"))
def _probe(scene: Scene, cfg: RenderConfig, height: int, width: int, key):
    frame = jnp.int32(0)
    order = make_order(height, width)
    pids = pids_from_order(order, width)
    jitter = camera_jitter(cfg, key, frame, pids, height, width)
    origins, directions = generate_rays_flat(
        Camera.reference_default(), order.rows, order.cols, jitter, height, width
    )
    state = initial_path_state(origins, directions, cfg.spectrum_samples, pids)
    intersect = make_brute_intersector(scene)
    total = jnp.zeros((), jnp.float32)
    for b in range(cfg.max_path_length):  # unrolled: python loop, static depth
        uniforms = bounce_uniforms(cfg, key, frame, b, pids, height, width)
        state, stats = trace_bounce(
            scene, cfg, intersect, jnp.int32(b), state, uniforms, with_stats=True
        )
        total = total + stats["path"].astype(jnp.float32) + stats["shadow"].astype(jnp.float32)
    return total


def count_traced_rays(
    scene: Scene, cfg: RenderConfig, height: int, width: int, probe_scale: int = 4
) -> float:
    """Estimated rays traced per frame at (height, width), 1 spp."""
    ph = max(height // probe_scale, 8)
    pw = max(width // probe_scale, 8)
    probe = float(_probe(scene, cfg, ph, pw, jax.random.PRNGKey(0)))
    scale = (height * width) / (ph * pw)
    return probe * scale * cfg.samples_per_frame
