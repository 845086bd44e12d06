"""Random-number supply for the integrator.

Two modes (see :class:`tpu_pathtracer.config.NoiseMode`):

* **PRNG** — counter-based ``jax.random`` keyed on (frame, bounce, purpose).
  Independent uniforms per pixel and per use; bit-reproducible regardless of
  device count or sharding.  This replaces — and fixes — the reference's
  wall-clock-seeded mt19937 noise buffers (reference: renderer/Renderer.mm:109-129,
  485-497), whose 64x64 tiling correlates pixels 64 apart and whose one float4
  is reused for light selection, lobe choice AND bounce direction within a
  bounce (reference: renderer/Shaders.metal:135-138, 152-159, 204).

* **TILED** — statistical parity mode reproducing the reference's noise
  plumbing: a 64x64 float4 tile per (frame, bounce), indexed with the
  reference's offset formula, with the same component swizzles and intra-bounce
  reuse.  Useful for studying how much image quality the reference loses to its
  correlated sampling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import NoiseMode, RenderConfig


def _tile(cfg: RenderConfig, key, frame, bounce) -> jnp.ndarray:
    nd = cfg.noise_dimensions
    k = jax.random.fold_in(jax.random.fold_in(key, 0x7113D), bounce)
    return jax.random.uniform(k, (nd * nd, 4), jnp.float32)


def _tile_lookup(cfg: RenderConfig, tile, frame, bounce, height, width):
    """noiseIndex = ((x + bounce + frame/3) % ND) + ((y + bounce + frame/5) % ND) * ND
    (reference: renderer/Shaders.metal:135-138); y counts rows bottom-up."""
    nd = cfg.noise_dimensions
    x = jnp.arange(width, dtype=jnp.int32)[None, :]
    row = jnp.arange(height, dtype=jnp.int32)[:, None]
    y = (height - 1) - row
    ix = (x + bounce + frame // 3) % nd
    iy = (y + bounce + frame // 5) % nd
    return tile[(ix + iy * nd).reshape(-1)]  # (H*W, 4)


def camera_jitter(cfg: RenderConfig, key, frame, height, width) -> jnp.ndarray:
    """(H, W, 2) uniforms for the AA jitter (reference: renderer/Shaders.metal:91)."""
    if cfg.noise_mode == NoiseMode.TILED:
        nd = cfg.noise_dimensions
        tile = _tile(cfg, key, frame, -1)
        x = jnp.arange(width, dtype=jnp.int32)[None, :] % nd
        row = jnp.arange(height, dtype=jnp.int32)[:, None]
        y = ((height - 1) - row) % nd
        smp = tile[(x + y * nd).reshape(-1)][:, :2]
        return smp.reshape(height, width, 2)
    return jax.random.uniform(key, (height, width, 2), jnp.float32)


def bounce_uniforms(cfg: RenderConfig, key, frame, bounce, height, width) -> dict:
    """Per-bounce uniforms for one wavefront of H*W rays.

    Keys: ``light_select`` (N,), ``light_bary`` (N,2), ``lobe`` (N,),
    ``bounce_dir`` (N,2).
    """
    num = height * width
    if cfg.noise_mode == NoiseMode.TILED:
        smp = _tile_lookup(
            cfg, _tile(cfg, key, frame, bounce), frame, bounce, height, width
        )
        sx, sy, sz, sw = smp[:, 0], smp[:, 1], smp[:, 2], smp[:, 3]
        return {
            "light_select": sz,                            # noiseSample.z
            "light_bary": jnp.stack([sw, sx], axis=-1),    # noiseSample.wx
            "lobe": sy,                                    # noiseSample.y
            "bounce_dir": jnp.stack([sz, sw], axis=-1),    # noiseSample.zw
        }
    k = jax.random.fold_in(key, bounce)
    u = jax.random.uniform(k, (num, 6), jnp.float32)
    return {
        "light_select": u[:, 0],
        "light_bary": u[:, 1:3],
        "lobe": u[:, 3],
        "bounce_dir": u[:, 4:6],
    }
