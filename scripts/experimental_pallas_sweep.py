"""Candidate-sweep kernels: split traversal by per-ray leaf-candidate count.

Measured facts that drive this design (scripts/perf_window_ab.py,
scripts/sim_ordered.py, v5e):

  * ~90% of the window-walk's cost is the leaf Moller-Trumbore stage, and its
    lane utilization is ~4%: a 768-lane tile demands 100-150 distinct leaves,
    each costing a full-width block op serving ~20 lanes.
  * Per ray the truth is tiny: with the big-triangle prepass priming best_t,
    the median ray's [eps, prime_t) segment crosses exactly ONE leaf box
    (mean 2.5, p95 8 at leaf16).

So: a cheap box SWEEP (no tree walk — every lane tests every leaf AABB, a
handful of 16-row windows for the bundled scenes) classifies rays by
candidate count.  Rays with <= 1 candidate sort by THAT candidate (the
wavefront sort key carries a mode bit + leaf id, costing zero extra sort
operands), which makes their MT near-dense: a tile's lanes all demand the
same 1-2 leaves.  Only multi-candidate rays (~p50 tail) pay the full
window-walk.  Results are identical to the walk: the candidate set after
prime culling is exactly the set of leaves the walk could MT, and both
paths run the same _mt8 blocks in the same order.

Tables: BVHLayout.leafbox (L16, 8) f32 / leafmeta (L16, 4) i32
[first_tri, tri_count, dfs_node_id, 0] in DFS-leaf order (accel/layout.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_pathtracer.accel.layout import BVHLayout
from tpu_pathtracer.ops.intersect import HitShade  # noqa: F401
from tpu_pathtracer.ops.pallas_traverse import _mt8
from tpu_pathtracer.ops.traverse import safe_inverse

SWEEP_W = 16  # leaf-box rows tested per sweep step


def _prime(pre_ref, n_prepass, act, dxyz, oxyz, t_min, best, latch):
    """Big-triangle prepass: identical blocks/order to the window kernel's
    phase 0, so primed best_t values match bit for bit."""
    tile = act.shape[0]
    pred_act = jnp.broadcast_to(act[None, :], (8, tile))
    for b in range(n_prepass // 8):
        tb = pre_ref[b * 8:(b + 1) * 8, :]
        best = _mt8(tb, pred_act, dxyz, oxyz, t_min, best, tb[:, 21:22],
                    latch=latch)
    return best


def _leaf_hits(lbox_ref, w, oxyz, dxyz, ixyz, t_min, best_t):
    """Slab-test one (SWEEP_W, 8) leaf-box window against all lanes.

    Returns the (SWEEP_W, TILE) hit mask (enter < best_t culled).  The
    arithmetic must stay identical wherever candidate counts are derived.
    """
    ox, oy, oz = oxyz
    ix, iy, iz = ixyz
    nblk = lbox_ref[pl.ds(w, SWEEP_W), :]
    t0x = (nblk[:, 0:1] - ox[None, :]) * ix[None, :]
    t1x = (nblk[:, 3:4] - ox[None, :]) * ix[None, :]
    t0y = (nblk[:, 1:2] - oy[None, :]) * iy[None, :]
    t1y = (nblk[:, 4:5] - oy[None, :]) * iy[None, :]
    t0z = (nblk[:, 2:3] - oz[None, :]) * iz[None, :]
    t1z = (nblk[:, 5:6] - oz[None, :]) * iz[None, :]
    enter = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    exit_ = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    return (enter <= exit_) & (exit_ > t_min) & (enter < best_t[None, :])


def _count_kernel(
    rays_ref, lbox_ref, pre_ref, out_ref, *,
    num_leaves: int, n_prepass: int, t_min: float,
):
    ox, oy, oz = rays_ref[0, :], rays_ref[1, :], rays_ref[2, :]
    dx, dy, dz = rays_ref[3, :], rays_ref[4, :], rays_ref[5, :]
    act = rays_ref[6, :] > 0.0
    t_max = rays_ref[7, :]
    ix, iy, iz = safe_inverse(dx, dy, dz)
    oxyz, dxyz, ixyz = (ox, oy, oz), (dx, dy, dz), (ix, iy, iz)
    tile = ox.shape[0]

    zeros = jnp.zeros((tile,), jnp.float32)
    best = (t_max, zeros, zeros, zeros, zeros)
    best = _prime(pre_ref, n_prepass, act, dxyz, oxyz, t_min, best, "argmin")
    best_t = best[0]

    big = jnp.int32(2 ** 20)
    count = jnp.zeros((tile,), jnp.int32)
    first = jnp.full((tile,), big, jnp.int32)
    nw = lbox_ref.shape[0] // SWEEP_W
    for wi in range(nw):
        w = wi * SWEEP_W
        hit = _leaf_hits(lbox_ref, w, oxyz, dxyz, ixyz, t_min, best_t)
        hit = hit & act[None, :]
        count = count + jnp.sum(hit.astype(jnp.int32), axis=0)
        ids = w + jax.lax.broadcasted_iota(jnp.int32, (SWEEP_W, 1), 0)
        cand = jnp.where(hit, jnp.broadcast_to(ids, hit.shape), big)
        first = jnp.minimum(first, jnp.min(cand, axis=0))

    out_ref[0, :] = count.astype(jnp.float32)
    out_ref[1, :] = jnp.where(first < big, first, num_leaves).astype(jnp.float32)
    for k in range(2, 8):
        out_ref[k, :] = zeros


def sweep_count(o, d, lay: BVHLayout, active=None, tile: int = 1536,
                t_min: float = 0.0, prepass: int = 32):
    """(count, first_leaf) per ray: leaf AABBs crossed by [t_min, prime_t).

    ``first_leaf`` is a row into lay.leafbox (num_leaves when none).
    """
    n = o.shape[1]
    pad = (-n) % tile
    act = (jnp.ones((n,), jnp.float32) if active is None
           else active.astype(jnp.float32))
    t_max_arr = jnp.full((n,), jnp.inf, jnp.float32)
    rays = jnp.concatenate([o, d, act[None], t_max_arr[None]], axis=0)
    if pad:
        rays = jnp.pad(rays, ((0, 0), (0, pad)))
    total = n + pad
    prepass = min(prepass, lay.prepass.shape[0], lay.num_tris)
    prepass -= prepass % 8
    kernel = functools.partial(
        _count_kernel, num_leaves=lay.num_leaves, n_prepass=prepass,
        t_min=t_min,
    )
    out = pl.pallas_call(
        kernel,
        grid=(total // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, total), jnp.float32),
    )(rays, lay.leafbox, lay.prepass[:max(prepass, 8)])
    return (
        out[0, :n].astype(jnp.int32),
        out[1, :n].astype(jnp.int32),
    )


def _mt1_kernel(
    rays_ref, lbox_ref, lmeta_ref, tris_ref, pre_ref, out_ref, *,
    num_leaves: int, num_tris: int, n_prepass: int, t_min: float,
    mtblock: int = 16,
):
    ox, oy, oz = rays_ref[0, :], rays_ref[1, :], rays_ref[2, :]
    dx, dy, dz = rays_ref[3, :], rays_ref[4, :], rays_ref[5, :]
    act = rays_ref[6, :] > 0.0
    t_max = rays_ref[7, :]
    ix, iy, iz = safe_inverse(dx, dy, dz)
    oxyz, dxyz, ixyz = (ox, oy, oz), (dx, dy, dz), (ix, iy, iz)
    tile = ox.shape[0]
    zeros = jnp.zeros((tile,), jnp.float32)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (mtblock, 1), 0)

    best = (
        t_max, zeros, zeros,
        jnp.full((tile,), float(num_tris), jnp.float32),
        zeros,
    )
    best = _prime(pre_ref, n_prepass, act, dxyz, oxyz, t_min, best, "argmin")

    # find the (single) candidate leaf per lane — same arithmetic as
    # _count_kernel, so the classification matches exactly
    big = jnp.int32(2 ** 20)
    first = jnp.full((tile,), big, jnp.int32)
    nw = lbox_ref.shape[0] // SWEEP_W
    for wi in range(nw):
        w = wi * SWEEP_W
        hit = _leaf_hits(lbox_ref, w, oxyz, dxyz, ixyz, t_min, best[0])
        hit = hit & act[None, :]
        ids = w + jax.lax.broadcasted_iota(jnp.int32, (SWEEP_W, 1), 0)
        cand = jnp.where(hit, jnp.broadcast_to(ids, hit.shape), big)
        first = jnp.minimum(first, jnp.min(cand, axis=0))

    # min-walk over the tile's distinct candidate leaves (sorted wavefronts
    # put the same leaf in every lane: typically 1-2 iterations per tile)
    sent = big
    cur0 = jnp.where(act & (first < big), first, sent)

    def cond(c):
        return jnp.min(c[0]) < sent

    def body(c):
        cur, bst = c
        j = jnp.min(cur)
        first_tri = lmeta_ref[j, 0]
        cnt = lmeta_ref[j, 1]
        dfsid = lmeta_ref[j, 2]
        a_lo = first_tri & ~jnp.int32(mtblock - 1)
        nblocks = jax.lax.div(
            first_tri + cnt - a_lo + mtblock - 1, jnp.int32(mtblock)
        )
        on = cur == j

        def mt_cond(ic):
            return ic[0] < nblocks

        def mt_body(ic):
            i, b = ic
            r0 = a_lo + i * mtblock
            tb = tris_ref[pl.ds(r0, mtblock), :]
            pred = (tb[:, 21:22].astype(jnp.int32) == dfsid) & on[None, :]
            row_ids = (r0 + iota_b).astype(jnp.float32)
            return i + 1, _mt8(tb, pred, dxyz, oxyz, t_min, b, row_ids,
                               latch="argmin")

        _, bst = jax.lax.while_loop(mt_cond, mt_body, (jnp.int32(0), bst))
        return jnp.where(on, sent, cur), bst

    _, best = jax.lax.while_loop(cond, body, (cur0, best))
    best_t, best_u, best_v, best_i, best_orig = best
    out_ref[0, :] = best_t
    out_ref[1, :] = best_u
    out_ref[2, :] = best_v
    out_ref[3, :] = best_i
    out_ref[4, :] = best_orig
    for k in range(5, 8):
        out_ref[k, :] = zeros


def intersect_sweep1(
    o, d, lay: BVHLayout, active=None, tile: int = 768,
    t_min: float = 0.0, prepass: int = 32, t_max=None,
):
    """Nearest-hit for rays with <= 1 candidate leaf (active mask selects
    them): prepass prime + one targeted leaf MT.  Same raw (8, N) result
    rows as the window kernel; resolve with resolve_window_payload."""
    n = o.shape[1]
    pad = (-n) % tile
    act = (jnp.ones((n,), jnp.float32) if active is None
           else active.astype(jnp.float32))
    if t_max is None:
        t_max_arr = jnp.full((n,), jnp.inf, jnp.float32)
    else:
        t_max_arr = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)
    rays = jnp.concatenate([o, d, act[None], t_max_arr[None]], axis=0)
    if pad:
        rays = jnp.pad(rays, ((0, 0), (0, pad)))
    total = n + pad
    prepass = min(prepass, lay.prepass.shape[0], lay.num_tris)
    prepass -= prepass % 8
    kernel = functools.partial(
        _mt1_kernel, num_leaves=lay.num_leaves, num_tris=lay.num_tris,
        n_prepass=prepass, t_min=t_min,
    )
    out = pl.pallas_call(
        kernel,
        grid=(total // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, total), jnp.float32),
    )(rays, lay.leafbox, lay.leafmeta, lay.tris8, lay.prepass[:max(prepass, 8)])
    return out[:, :n], t_max_arr
