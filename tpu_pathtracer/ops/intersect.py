"""Ray-triangle intersection backends.

The reference delegates nearest-hit queries to Apple's closed
MPSRayIntersector/MPSTriangleAccelerationStructure
(reference: renderer/Renderer.mm:456-469, 517-553).  There is no vendor
intersection library on TPU, so this framework implements its own:

  * :func:`intersect_brute` — dense Moller-Trumbore over every triangle,
    chunk-scanned to bound live memory.  O(N*T) but branch-free and perfectly
    vectorized; the right tool for tiny scenes and the ground truth oracle for
    BVH tests.
  * ``accel.traverse`` — LBVH + stackless traversal (see accel/), the production
    path.

Hit convention: barycentric (u, v) weight vertices 1 and 2; position =
(1-u-v)*p0 + u*p1 + v*p2.  Misses have t = +inf and tri = 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.math3d import cross, dot


class Hit(NamedTuple):
    t: jnp.ndarray     # (N,) float32, +inf on miss
    tri: jnp.ndarray   # (N,) int32, 0 on miss
    u: jnp.ndarray     # (N,) float32 weight on p1
    v: jnp.ndarray     # (N,) float32 weight on p2

    @property
    def uvw(self) -> jnp.ndarray:
        """(N, 3) interpolation weights on (p0, p1, p2)."""
        return jnp.stack([1.0 - self.u - self.v, self.u, self.v], axis=-1)

    @property
    def valid(self) -> jnp.ndarray:
        return jnp.isfinite(self.t)


def moller_trumbore(o, d, p0, e1, e2, t_min: float = 0.0):
    """All-pairs Moller-Trumbore: rays (N,3) x triangles (C,3) -> (N,C) t/u/v.

    Double-sided (the reference configures MPS with no culling,
    renderer/Renderer.mm:465).
    """
    pvec = cross(d[:, None, :], e2[None, :, :])          # (N, C, 3)
    det = dot(e1[None], pvec)                            # (N, C)
    inv_det = jnp.where(det != 0.0, 1.0 / det, 0.0)
    tvec = o[:, None, :] - p0[None, :, :]
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, e1[None, :, :])
    v = dot(d[:, None, :], qvec) * inv_det
    t = dot(e2[None], qvec) * inv_det
    ok = (
        (det != 0.0)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
    )
    return jnp.where(ok, t, jnp.inf), u, v


def intersect_brute(
    o: jnp.ndarray,
    d: jnp.ndarray,
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    t_min: float = 0.0,
    chunk: int = 256,
) -> Hit:
    """Nearest-hit over all triangles, scanning triangle chunks to keep the
    (N, chunk) intermediates bounded."""
    num_tris = p0.shape[0]
    e1 = p1 - p0
    e2 = p2 - p0

    chunk = min(chunk, max(num_tris, 1))
    pad = (-num_tris) % chunk
    if pad:
        padv = jnp.zeros((pad, 3), p0.dtype)
        p0c = jnp.concatenate([p0, padv])
        e1c = jnp.concatenate([e1, padv])  # degenerate -> det == 0 -> miss
        e2c = jnp.concatenate([e2, padv])
    else:
        p0c, e1c, e2c = p0, e1, e2
    num_chunks = (num_tris + pad) // chunk
    p0c = p0c.reshape(num_chunks, chunk, 3)
    e1c = e1c.reshape(num_chunks, chunk, 3)
    e2c = e2c.reshape(num_chunks, chunk, 3)
    base = jnp.arange(num_chunks, dtype=jnp.int32) * chunk

    n = o.shape[0]
    init = (
        jnp.full((n,), jnp.inf, jnp.float32),
        jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.float32),
        jnp.zeros((n,), jnp.float32),
    )

    def body(carry, chunk_data):
        best_t, best_i, best_u, best_v = carry
        cp0, ce1, ce2, cbase = chunk_data
        t, u, v = moller_trumbore(o, d, cp0, ce1, ce2, t_min)
        local = jnp.argmin(t, axis=1)                          # (N,)
        rows = jnp.arange(n)
        ct = t[rows, local]
        better = ct < best_t
        return (
            jnp.where(better, ct, best_t),
            jnp.where(better, cbase + local.astype(jnp.int32), best_i),
            jnp.where(better, u[rows, local], best_u),
            jnp.where(better, v[rows, local], best_v),
        ), None

    (best_t, best_i, best_u, best_v), _ = jax.lax.scan(
        body, init, (p0c, e1c, e2c, base)
    )
    return Hit(t=best_t, tri=best_i, u=best_u, v=best_v)
