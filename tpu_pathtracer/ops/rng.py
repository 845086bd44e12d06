"""Counter-based per-pixel RNG (PCG hash family).

The reference seeds mt19937_64 from the wall clock and tiles a 64x64 noise
buffer across the screen (reference: renderer/Renderer.mm:109-129,485-497) —
non-reproducible and correlated.  The north-star design moves RNG to
counter-based hashing so every sample is a pure function of
(pixel, frame, bounce, purpose, seed): frames are bit-identical regardless of
device count, sharding, or evaluation order, which is what makes the
multi-chip tile/sample sharding in parallel/ exactly equivalent to the
single-chip render.

Hashes are the PCG3D/PCG4D mixers from Jarzynski & Olano, "Hash Functions for
GPU Rendering" (JCGT 2020) — pure uint32 VPU arithmetic, no threefry key
schedule per pixel.
"""

from __future__ import annotations

import jax.numpy as jnp

_U32 = jnp.uint32


def pcg4d(a, b, c, d):
    """PCG4D mix of four uint32 streams -> four decorrelated uint32 streams."""
    v0 = a.astype(_U32)
    v1 = jnp.asarray(b, _U32)
    v2 = jnp.asarray(c, _U32)
    v3 = jnp.asarray(d, _U32)
    mul = _U32(1664525)
    inc = _U32(1013904223)
    v0 = v0 * mul + inc
    v1 = v1 * mul + inc
    v2 = v2 * mul + inc
    v3 = v3 * mul + inc
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    v0 = v0 ^ (v0 >> 16)
    v1 = v1 ^ (v1 >> 16)
    v2 = v2 ^ (v2 >> 16)
    v3 = v3 ^ (v3 >> 16)
    v0 = v0 + v1 * v3
    v1 = v1 + v2 * v0
    v2 = v2 + v0 * v1
    v3 = v3 + v1 * v2
    return v0, v1, v2, v3


def _to_unit_float(bits: jnp.ndarray) -> jnp.ndarray:
    """uint32 -> float32 in [0, 1) using the top 24 bits."""
    return (bits >> 8).astype(jnp.float32) * jnp.float32(1.0 / 16777216.0)


def uniforms(pixel_id: jnp.ndarray, frame, bounce, salt, count: int) -> jnp.ndarray:
    """(N,) pixel ids -> (count, N) independent uniforms in [0, 1).

    ``salt`` folds the user seed in; ``frame``/``bounce`` are scalar counters.
    Each group of 4 lanes comes from one PCG4D evaluation re-keyed by lane
    group, so any ``count`` is cheap.
    """
    pid = pixel_id.astype(_U32)
    frame = jnp.asarray(frame, _U32)
    bounce = jnp.asarray(bounce, _U32)
    salt = jnp.asarray(salt, _U32)
    outs = []
    for group in range((count + 3) // 4):
        v = pcg4d(
            pid,
            frame + _U32(0x9E3779B9) * _U32(group),
            bounce ^ (salt << _U32(1)),
            salt + _U32(group) * _U32(0x85EBCA6B),
        )
        outs.extend(_to_unit_float(x) for x in v)
    return jnp.stack(outs[:count], axis=0)
