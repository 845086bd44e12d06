"""Pallas TPU kernel: tile-coherent stackless BVH traversal + hit resolve.

The production intersection path, replacing the vendor library the reference
leans on (MPSRayIntersector, reference: renderer/Renderer.mm:464-469).  Design,
driven by TPU realities (no per-lane gather, VPU wants full 128-lane vectors,
VMEM is ~16 MB):

  * The whole scene — DFS-threaded node table + triangle soup — resides in
    VMEM.  Node/triangle fetches are *scalar dynamic row slices*, not per-ray
    gathers.
  * The grid partitions rays into tiles.  Each tile runs a tile-synchronous
    loop: every lane keeps its own node pointer ``cur``; each step processes
    the scalar node ``min(cur)``.  Because the layout is DFS preorder
    (first child == node+1, escape links point forward), min-order IS DFS
    order, so the tile visits the union of its lanes' traversal sets exactly
    once — for coherent rays this degenerates to single-ray traversal cost.
  * Leaf runs are contiguous; up to ``max_leaf`` Moller-Trumbore tests unroll
    statically, each a full-width vector op over the tile — predicated, not
    branched (a lax.cond here measured 3.5x slower).
  * A second min-loop over the tile's *unique hit triangles* resolves the
    shading payload (interpolated position/normal, material id, light index,
    original triangle id) in-kernel, so the frame pipeline contains no
    per-ray gathers at all (XLA TPU gathers measured ~16 ms per 2M rays —
    they were the bottleneck, not the traversal).

Node records: (M, 8) f32 [bmin.xyz, bmax.xyz, pad2] + (M, 2) i32 [miss, meta];
meta = first_tri * 64 + count (0 = internal).  Triangle record: see
accel/layout.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.layout import BVHLayout
from .intersect import HitShade
from .traverse import safe_inverse

DEFAULT_TILE = 1536


def _traverse_kernel(
    rays_ref,      # (8, TILE) f32: ox oy oz dx dy dz active t_max
    nodes_ref,     # (M, 8) f32 VMEM
    meta_ref,      # (M, 2) i32 VMEM [miss, first*64+count]
    tris_ref,      # (T+1, 24) f32 VMEM
    out_ref,       # (12, TILE) f32: t u v orig mat light+1 px py pz nx ny nz
    *,
    num_nodes: int,
    max_leaf: int,
    t_min: float,
    resolve: bool,
):
    ox = rays_ref[0, :]
    oy = rays_ref[1, :]
    oz = rays_ref[2, :]
    dx = rays_ref[3, :]
    dy = rays_ref[4, :]
    dz = rays_ref[5, :]
    act = rays_ref[6, :] > 0.0
    t_max = rays_ref[7, :]
    ix, iy, iz = safe_inverse(dx, dy, dz)

    tile = ox.shape[0]
    num_tris = tris_ref.shape[0] - 1  # last row is the miss sentinel
    sentinel = jnp.int32(num_nodes)
    cur0 = jnp.where(act, jnp.int32(0), sentinel)
    # seeding best_t with t_max culls every subtree beyond the cap (the big
    # win for shadow rays, whose useful range ends at the sampled light)
    best_t0 = t_max
    best_i0 = jnp.full((tile,), num_tris, jnp.int32)  # sentinel tri row
    zeros = jnp.zeros((tile,), jnp.float32)

    # ---------------- phase 1: traversal walk ----------------
    def cond(carry):
        return jnp.min(carry[0]) < sentinel

    def body(carry):
        if resolve:
            cur, best_t, best_i, best_u, best_v = carry
        else:
            cur, best_t, best_i, best_u, best_v, best_orig = carry
        node = jnp.min(cur)                       # scalar: next DFS node
        row = nodes_ref[node, :]
        mask = cur == node

        t0x = (row[0] - ox) * ix
        t1x = (row[3] - ox) * ix
        t0y = (row[1] - oy) * iy
        t1y = (row[4] - oy) * iy
        t0z = (row[2] - oz) * iz
        t1z = (row[5] - oz) * iz
        enter = jnp.maximum(
            jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
            jnp.minimum(t0z, t1z),
        )
        exit_ = jnp.minimum(
            jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
            jnp.maximum(t0z, t1z),
        )
        hit_box = mask & (enter <= exit_) & (exit_ > t_min) & (enter < best_t)

        miss_link = meta_ref[node, 0]
        meta = meta_ref[node, 1]
        count = meta & 63
        first = meta >> 6
        is_leaf = count > 0

        for k in range(max_leaf):
            on = is_leaf & (k < count)
            tri = jnp.minimum(first + k, num_tris)
            trow = tris_ref[tri, :]
            # Moller-Trumbore against one broadcast triangle
            px = dy * trow[8] - dz * trow[7]
            py = dz * trow[6] - dx * trow[8]
            pz = dx * trow[7] - dy * trow[6]
            det = trow[3] * px + trow[4] * py + trow[5] * pz
            inv = jnp.where(det != 0.0, 1.0 / det, 0.0)
            tx = ox - trow[0]
            ty = oy - trow[1]
            tz = oz - trow[2]
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * trow[5] - tz * trow[4]
            qy = tz * trow[3] - tx * trow[5]
            qz = tx * trow[4] - ty * trow[3]
            v = (dx * qx + dy * qy + dz * qz) * inv
            tt = (trow[6] * qx + trow[7] * qy + trow[8] * qz) * inv
            ok = (
                on
                & hit_box
                & (det != 0.0)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
                & (tt > t_min)
                & (tt < best_t)
            )
            best_t = jnp.where(ok, tt, best_t)
            best_i = jnp.where(ok, tri, best_i)
            best_u = jnp.where(ok, u, best_u)
            best_v = jnp.where(ok, v, best_v)
            if not resolve:
                # occlusion queries only need the original tri id: latch it
                # from the scalar row now and skip phase 2 entirely
                best_orig = jnp.where(ok, trow[9], best_orig)

        nxt = jnp.where(hit_box & jnp.logical_not(is_leaf), node + 1, miss_link)
        cur = jnp.where(mask, nxt, cur)
        if resolve:
            return cur, best_t, best_i, best_u, best_v
        return cur, best_t, best_i, best_u, best_v, best_orig

    if resolve:
        _, best_t, best_i, best_u, best_v = jax.lax.while_loop(
            cond, body, (cur0, best_t0, best_i0, zeros, zeros)
        )
    else:
        _, best_t, best_i, best_u, best_v, best_orig = jax.lax.while_loop(
            cond, body, (cur0, best_t0, best_i0, zeros, zeros, zeros)
        )
        out_ref[0, :] = best_t
        out_ref[1, :] = best_u
        out_ref[2, :] = best_v
        out_ref[3, :] = best_orig
        for k in range(4, 12):
            out_ref[k, :] = zeros
        return

    # ---------------- phase 2: shading-payload resolve ----------------
    # Serve each *unique* hit triangle once: scalar row fetch, broadcast
    # latch under the lane mask.  Unique hits per coherent tile ~ tens.
    tri_sentinel = jnp.int32(num_tris + 1)

    def rcond(carry):
        return jnp.min(carry[0]) < tri_sentinel

    def rbody(carry):
        pend, orig, mat, light, px, py, pz, nx, ny, nz = carry
        j = jnp.min(pend)
        row = tris_ref[j, :]
        mask = pend == j
        w0 = 1.0 - best_u - best_v
        hpx = row[0] + best_u * row[3] + best_v * row[6]
        hpy = row[1] + best_u * row[4] + best_v * row[7]
        hpz = row[2] + best_u * row[5] + best_v * row[8]
        hnx = row[10] * w0 + row[13] * best_u + row[16] * best_v
        hny = row[11] * w0 + row[14] * best_u + row[17] * best_v
        hnz = row[12] * w0 + row[15] * best_u + row[18] * best_v
        rlen = jax.lax.rsqrt(
            jnp.maximum(hnx * hnx + hny * hny + hnz * hnz, 1e-20)
        )
        orig = jnp.where(mask, row[9], orig)
        mat = jnp.where(mask, row[19], mat)
        light = jnp.where(mask, row[20], light)
        px = jnp.where(mask, hpx, px)
        py = jnp.where(mask, hpy, py)
        pz = jnp.where(mask, hpz, pz)
        nx = jnp.where(mask, hnx * rlen, nx)
        ny = jnp.where(mask, hny * rlen, ny)
        nz = jnp.where(mask, hnz * rlen, nz)
        pend = jnp.where(mask, tri_sentinel, pend)
        return pend, orig, mat, light, px, py, pz, nx, ny, nz

    init = (best_i,) + (zeros,) * 9
    _, orig, mat, light, px, py, pz, nx, ny, nz = jax.lax.while_loop(
        rcond, rbody, init
    )

    out_ref[0, :] = best_t
    out_ref[1, :] = best_u
    out_ref[2, :] = best_v
    out_ref[3, :] = orig
    out_ref[4, :] = mat
    out_ref[5, :] = light
    out_ref[6, :] = px
    out_ref[7, :] = py
    out_ref[8, :] = pz
    out_ref[9, :] = nx
    out_ref[10, :] = ny
    out_ref[11, :] = nz


def intersect_bvh_pallas(
    o: jnp.ndarray,
    d: jnp.ndarray,
    lay: BVHLayout,
    t_min: float = 0.0,
    active=None,
    tile: int = DEFAULT_TILE,
    t_max=None,
    resolve: bool = True,
) -> HitShade:
    """o/d: (3, N) rays -> HitShade (fully resolved, gather-free).

    ``t_max``: optional (N,) per-ray range cap — a pure performance hint
    (hits at or beyond it report as misses); shadow rays cap at their light
    sample distance.
    """
    n = o.shape[1]
    pad = (-n) % tile
    if active is None:
        act = jnp.ones((n,), jnp.float32)
    else:
        act = active.astype(jnp.float32)
    if t_max is None:
        t_max_arr = jnp.full((n,), jnp.inf, jnp.float32)
    else:
        t_max_arr = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)
    rays = jnp.concatenate([o, d, act[None], t_max_arr[None]], axis=0)  # (8, N)
    if pad:
        rays = jnp.pad(rays, ((0, 0), (0, pad)))       # padded lanes inactive
    total = n + pad
    grid = total // tile

    kernel = functools.partial(
        _traverse_kernel,
        num_nodes=lay.num_nodes,
        max_leaf=lay.max_leaf,
        t_min=t_min,
        resolve=resolve,
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes f32, whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),  # node meta i32, whole array
            pl.BlockSpec(memory_space=pltpu.VMEM),  # tris, whole array
        ],
        out_specs=pl.BlockSpec((12, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((12, total), jnp.float32),
    )(rays, lay.nodes, lay.nodes_meta, lay.tris)

    out = out[:, :n]
    # lanes whose best_t never beat the cap are misses
    t = jnp.where(out[0] < t_max_arr, out[0], jnp.inf)
    return HitShade(
        t=t,
        u=out[1],
        v=out[2],
        tri=out[3].astype(jnp.int32),
        mat=out[4].astype(jnp.int32),
        light=out[5].astype(jnp.int32) - 1,
        pos=out[6:9],
        normal=out[9:12],
    )


def make_pallas_intersector(lay: BVHLayout, t_min: float = 0.0, tile: int = DEFAULT_TILE):
    def fn(o, d, active, t_max=None):
        # a capped query is an occlusion-style query: skip payload resolve
        return intersect_bvh_pallas(
            o, d, lay, t_min=t_min, active=active, tile=tile, t_max=t_max,
            resolve=t_max is None,
        )

    return fn
