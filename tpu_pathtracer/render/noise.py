"""Random-number supply for the integrator.

Two modes (see :class:`tpu_pathtracer.config.NoiseMode`):

* **PRNG** — counter-based PCG4D hashing (ops/rng.py): every uniform is a pure
  function of (absolute pixel id, frame, bounce, purpose, seed).  Independent
  per pixel and per use, and bit-identical regardless of device count or tile
  sharding — the property that makes parallel/ renders exactly equal to
  single-chip renders.  This replaces — and fixes — the reference's
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
from ..ops import rng as rng_ops

_CAMERA_SALT = 0x5CA1AB1E


def key_salt(key: jnp.ndarray) -> jnp.ndarray:
    """Collapse a jax.random key into a uint32 salt for the counter hash."""
    data = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    return data[0] ^ (data[-1] * jnp.uint32(0x9E3779B9))


def pixel_ids(
    height: int, width: int, row0, full_height: int, full_width: int
) -> jnp.ndarray:
    """(H*W,) absolute pixel ids for a row-tile starting at ``row0``."""
    r = row0 + jnp.arange(height, dtype=jnp.uint32)[:, None]
    c = jnp.arange(width, dtype=jnp.uint32)[None, :]
    return (r * jnp.uint32(full_width) + c).reshape(-1)


def _tile(cfg: RenderConfig, key, bounce) -> jnp.ndarray:
    nd = cfg.noise_dimensions
    k = jax.random.fold_in(jax.random.fold_in(key, 0x7113D), bounce)
    return jax.random.uniform(k, (nd * nd, 4), jnp.float32)


def _tile_lookup(cfg: RenderConfig, tile, frame, bounce, height, width, row0, full_height):
    """noiseIndex = ((x + bounce + frame/3) % ND) + ((y + bounce + frame/5) % ND) * ND
    (reference: renderer/Shaders.metal:135-138); y counts rows bottom-up."""
    nd = cfg.noise_dimensions
    x = jnp.arange(width, dtype=jnp.int32)[None, :]
    row = row0 + jnp.arange(height, dtype=jnp.int32)[:, None]
    y = (full_height - 1) - row
    ix = (x + bounce + frame // 3) % nd
    iy = (y + bounce + frame // 5) % nd
    return tile[(ix + iy * nd).reshape(-1)]  # (H*W, 4)


def camera_jitter(
    cfg: RenderConfig, key, frame, height, width, row0=0,
    full_height=None, full_width=None,
) -> jnp.ndarray:
    """(2, H*W) uniforms for the AA jitter (reference: renderer/Shaders.metal:91)."""
    full_height = full_height or height
    full_width = full_width or width
    if cfg.noise_mode == NoiseMode.TILED:
        nd = cfg.noise_dimensions
        tile = _tile(cfg, key, -1)
        x = jnp.arange(width, dtype=jnp.int32)[None, :] % nd
        row = row0 + jnp.arange(height, dtype=jnp.int32)[:, None]
        y = ((full_height - 1) - row) % nd
        return tile[(x + y * nd).reshape(-1)][:, :2].T  # (2, H*W)
    pid = pixel_ids(height, width, row0, full_height, full_width)
    salt = key_salt(key) ^ jnp.uint32(_CAMERA_SALT)
    return rng_ops.uniforms(pid, frame, 0, salt, 2)  # (2, H*W)


def bounce_uniforms(
    cfg: RenderConfig, key, frame, bounce, height, width, row0=0,
    full_height=None, full_width=None,
) -> dict:
    """Per-bounce uniforms for one wavefront of H*W rays.

    Keys: ``light_select`` (N,), ``light_bary`` (2, N), ``lobe`` (N,),
    ``bounce_dir`` (2, N) — component-major like everything else.
    """
    full_height = full_height or height
    full_width = full_width or width
    if cfg.noise_mode == NoiseMode.TILED:
        smp = _tile_lookup(
            cfg, _tile(cfg, key, bounce), frame, bounce,
            height, width, row0, full_height,
        )
        sx, sy, sz, sw = smp[:, 0], smp[:, 1], smp[:, 2], smp[:, 3]
        return {
            "light_select": sz,                           # noiseSample.z
            "light_bary": jnp.stack([sw, sx], axis=0),    # noiseSample.wx
            "lobe": sy,                                   # noiseSample.y
            "bounce_dir": jnp.stack([sz, sw], axis=0),    # noiseSample.zw
        }
    pid = pixel_ids(height, width, row0, full_height, full_width)
    u = rng_ops.uniforms(pid, frame, bounce, key_salt(key), 6)
    return {
        "light_select": u[0],
        "light_bary": u[1:3],
        "lobe": u[3],
        "bounce_dir": u[4:6],
    }
