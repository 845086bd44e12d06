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


def _mt_row(trow, o, d, t_min):
    """Moller-Trumbore: ONE broadcast triangle row [p0.xyz, e1.xyz, e2.xyz,
    ...] against the tile's lane vectors -> (geo_ok, t, u, v).

    ``geo_ok`` is the geometric acceptance (det != 0, 0 <= u, 0 <= v,
    u+v <= 1, t > t_min); callers AND in their own participation and best_t
    predicates.  The single definition shared by the v1 prepass, the v1
    leaf loop and the any-hit occlusion leaf loop — intricate predicated
    intersection math must not drift between copies.
    """
    ox, oy, oz = o
    dx, dy, dz = d
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
    geo = (
        (det != 0.0)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (tt > t_min)
    )
    return geo, tt, u, v


def _slab_row(row, o, inv):
    """ONE node row [bmin.xyz, bmax.xyz, ...] against the tile's lane
    vectors -> (enter, exit).  Shared by the v1 walk and the any-hit
    occlusion walk (the window kernel keeps its (W, TILE) vector form)."""
    ox, oy, oz = o
    ix, iy, iz = inv
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
    return enter, exit_


def _traverse_kernel(
    rays_ref,      # (8, TILE) f32: ox oy oz dx dy dz active t_max
    nodes_ref,     # (M, 8) f32 VMEM
    meta_ref,      # (M, 2) i32 VMEM [miss, first*64+count]
    tris_ref,      # (T+1, 24) f32 VMEM
    *rest,         # [pre_ref (P, 24) f32 if n_prepass] + [out_ref]
    num_nodes: int,
    max_leaf: int,
    t_min: float,
    resolve: bool,
    n_prepass: int = 0,
):
    if n_prepass:
        pre_ref, out_ref = rest
    else:
        (out_ref,) = rest
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
    best_u0 = zeros
    best_v0 = zeros
    best_orig0 = zeros

    # ---------------- phase 0: big-triangle pre-pass ----------------
    # Prime best_t against the largest-area triangles (static row fetches,
    # padded with the zero sentinel row -> det == 0 -> no hit).  In closed
    # scenes most incoherent rays terminate on a wall/floor triangle, so the
    # primed best_t culls the subtrees behind it during the walk.
    for k in range(n_prepass):
        trow = pre_ref[k, :]
        geo, tt, u, v = _mt_row(trow, (ox, oy, oz), (dx, dy, dz), t_min)
        ok = act & geo & (tt < best_t0)
        best_t0 = jnp.where(ok, tt, best_t0)
        best_i0 = jnp.where(ok, trow[21].astype(jnp.int32), best_i0)
        best_u0 = jnp.where(ok, u, best_u0)
        best_v0 = jnp.where(ok, v, best_v0)
        if not resolve:
            best_orig0 = jnp.where(ok, trow[9], best_orig0)

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

        enter, exit_ = _slab_row(row, (ox, oy, oz), (ix, iy, iz))
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
            geo, tt, u, v = _mt_row(trow, (ox, oy, oz), (dx, dy, dz), t_min)
            ok = on & hit_box & geo & (tt < best_t)
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
            cond, body, (cur0, best_t0, best_i0, best_u0, best_v0)
        )
    else:
        _, best_t, best_i, best_u, best_v, best_orig = jax.lax.while_loop(
            cond, body, (cur0, best_t0, best_i0, best_u0, best_v0, best_orig0)
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


def _occlusion_anyhit_kernel(
    rays_ref,      # (8, TILE) f32: ox oy oz dx dy dz targetcode cap
    nodes_ref,     # (M, 8) f32 VMEM
    meta_ref,      # (M, 2) i32 VMEM [miss, first*64+count]
    tris_ref,      # (T+1, 24) f32 VMEM
    out_ref,       # (8, TILE) f32: [occluded, target_hit, 0...]
    *,
    num_nodes: int,
    max_leaf: int,
    t_min: float,
    eps: float,
):
    """Any-hit occlusion walk with early lane death.

    Visibility semantics match the reference's lightSamplingHandler
    (reference: renderer/Shaders.metal:214-231, "nearest hit must BE the
    targeted light triangle") re-expressed so a lane can stop at its FIRST
    occluder instead of finishing a nearest-hit walk:

      clear  =  target was hit  AND  no non-target hit closer than it

    ``targetcode`` packs per-lane state into the ray plane the nearest-hit
    kernels use for ``active``: 0 = inactive, 1 = environment sample (any
    scene hit occludes, no target to hit), ``orig_tri_id + 2`` otherwise.
    The occluder threshold is ``cap - 4*eps`` — the wavefront issues shadow
    caps at ``light_dist + 4*eps`` (render/wavefront.py), so the threshold
    recovers the light distance; the reference compares occluders against
    the target's own intersection t, which equals the sample distance up to
    Moller-Trumbore roundoff (~1e-6 relative — covered by the self-golden
    gates' 1e-3 band).

    A lane that latches an occluder jumps its cursor to the sentinel, so
    the tile's min-walk no longer visits subtrees only shadowed lanes
    demanded — the big win over the nearest-hit form, where an occluded
    lane keeps refining best_t to the end.
    """
    ox = rays_ref[0, :]
    oy = rays_ref[1, :]
    oz = rays_ref[2, :]
    dx = rays_ref[3, :]
    dy = rays_ref[4, :]
    dz = rays_ref[5, :]
    code = rays_ref[6, :]
    cap = rays_ref[7, :]
    act = code > 0.0
    targetf = code - 2.0           # env lanes: -1, never equals an orig id
    thresh = cap - 4.0 * eps       # occluders must be nearer than the light
    ix, iy, iz = safe_inverse(dx, dy, dz)

    tile = ox.shape[0]
    num_tris = tris_ref.shape[0] - 1
    sentinel = jnp.int32(num_nodes)
    cur0 = jnp.where(act, jnp.int32(0), sentinel)
    zeros = jnp.zeros((tile,), jnp.float32)

    def cond(carry):
        return jnp.min(carry[0]) < sentinel

    def body(carry):
        cur, occ, tgt = carry
        node = jnp.min(cur)
        row = nodes_ref[node, :]
        mask = cur == node

        enter, exit_ = _slab_row(row, (ox, oy, oz), (ix, iy, iz))
        hit_box = mask & (enter <= exit_) & (exit_ > t_min) & (enter < cap)

        miss_link = meta_ref[node, 0]
        meta = meta_ref[node, 1]
        count = meta & 63
        first = meta >> 6
        is_leaf = count > 0

        for k in range(max_leaf):
            on = is_leaf & (k < count)
            tri = jnp.minimum(first + k, num_tris)
            trow = tris_ref[tri, :]
            geo, tt, _, _ = _mt_row(trow, (ox, oy, oz), (dx, dy, dz), t_min)
            acc = on & hit_box & geo
            is_tgt = trow[9] == targetf
            occ = jnp.where(acc & (~is_tgt) & (tt < thresh), 1.0, occ)
            tgt = jnp.where(acc & is_tgt & (tt >= eps) & (tt < cap), 1.0, tgt)

        nxt = jnp.where(hit_box & jnp.logical_not(is_leaf), node + 1, miss_link)
        nxt = jnp.where(occ > 0.0, sentinel, nxt)   # early death: occluded
        cur = jnp.where(mask, nxt, cur)
        return cur, occ, tgt

    _, occ, tgt = jax.lax.while_loop(cond, body, (cur0, zeros, zeros))
    out_ref[0, :] = occ
    out_ref[1, :] = tgt
    for k in range(2, 8):
        out_ref[k, :] = zeros


def occlusion_clear_anyhit(
    o: jnp.ndarray,
    d: jnp.ndarray,
    lay: BVHLayout,
    active,
    t_max,
    target,
    eps: float,
    t_min: float = 0.0,
    tile: int = 3072,
) -> jnp.ndarray:
    """Shadow visibility via the any-hit kernel -> (N,) bool ``clear``.

    ``target``: (N,) int32 original-triangle id of the sampled light
    triangle, or -1 for environment samples (clear iff nothing hit).

    NOTE: inactive env lanes (active==0, target<0) report clear=True (their
    walk never runs, so ``occ`` stays 0) — callers must mask with their own
    active predicate, as render/wavefront.occlusion_clear does.
    """
    n = o.shape[1]
    pad = (-n) % tile
    act = active.astype(jnp.float32)
    code = jnp.where(
        act > 0.0,
        jnp.where(target >= 0, target.astype(jnp.float32) + 2.0, 1.0),
        0.0,
    )
    cap = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)
    rays = jnp.concatenate([o, d, code[None], cap[None]], axis=0)   # (8, N)
    if pad:
        rays = jnp.pad(rays, ((0, 0), (0, pad)))
    total = n + pad
    kernel = functools.partial(
        _occlusion_anyhit_kernel,
        num_nodes=lay.num_nodes,
        max_leaf=lay.max_leaf,
        t_min=t_min,
        eps=eps,
    )
    out = pl.pallas_call(
        kernel,
        grid=(total // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, total), jnp.float32),
    )(rays, lay.nodes, lay.nodes_meta, lay.tris)
    occ = out[0, :n] > 0.0
    tgt = out[1, :n] > 0.0
    return jnp.where(target >= 0, tgt & (~occ), ~occ)


def intersect_bvh_pallas(
    o: jnp.ndarray,
    d: jnp.ndarray,
    lay: BVHLayout,
    t_min: float = 0.0,
    active=None,
    tile: int = DEFAULT_TILE,
    t_max=None,
    resolve: bool = True,
    prepass: int = 0,
) -> HitShade:
    """o/d: (3, N) rays -> HitShade (fully resolved, gather-free).

    ``t_max``: optional (N,) per-ray range cap — a pure performance hint
    (hits at or beyond it report as misses); shadow rays cap at their light
    sample distance.

    ``prepass``: test the `prepass` largest-area triangles before the walk to
    prime best_t (0 disables).  Purely a performance knob; results identical.
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

    prepass = min(prepass, lay.prepass.shape[0], lay.num_tris)
    kernel = functools.partial(
        _traverse_kernel,
        num_nodes=lay.num_nodes,
        max_leaf=lay.max_leaf,
        t_min=t_min,
        resolve=resolve,
        n_prepass=prepass,
    )
    in_specs = [
        pl.BlockSpec((8, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),  # nodes f32, whole array
        pl.BlockSpec(memory_space=pltpu.VMEM),  # node meta i32, whole array
        pl.BlockSpec(memory_space=pltpu.VMEM),  # tris, whole array
    ]
    inputs = [rays, lay.nodes, lay.nodes_meta, lay.tris]
    if prepass:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(lay.prepass[:prepass])
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((12, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((12, total), jnp.float32),
    )(*inputs)

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


# =====================================================================
# Window-walk kernel (v2)
# =====================================================================
# Perf model learned from microbenchmarks on v5e (scripts/perf_decompose.py):
# the v1 kernel's per-node step costs ~1.2 us, dominated NOT by the
# min-reduce or the while loop (~170 ns together) but by the statically
# unrolled leaf Moller-Trumbore: 4 dynamic row fetches + ~96 scalar extracts
# execute on EVERY step, leaf or not.  The v2 design eliminates scalar
# extracts from the hot loop entirely:
#   * fetch 8 DFS-consecutive nodes as one (8, 8) block; slab-test all
#     8 boxes against all lanes as (8, TILE) vector ops (child data lives in
#     the sublane dimension);
#   * chain lanes through the window in-register (CHAIN advance rounds per
#     fetch) — DFS preorder makes every advance stay monotone, so the
#     min-over-lanes window base preserves the visit-union-once property;
#   * leaf triangles are DFS-contiguous, so the window's triangles are one
#     range [tri_start[w], tri_start[w+8]): MT runs on (8, 24) blocks as
#     (8, TILE) vector ops, predicated per-row on the owning leaf id
#     (tris col 21) == lane's node pointer;
#   * the shading payload resolve (v1 phase 2: a serial unique-hit loop)
#     moves OUTSIDE the kernel to one XLA gather (~5 ms / 2M rays, measured),
#     so the kernel returns only (t, u, v, row, orig).

WINDOW = 8
CHAIN = 4


def _mt_block(tb, pred, dxyz, oxyz, t_min):
    """Vectorized Moller-Trumbore: (K, 24) triangle rows x TILE lanes ->
    (ok, t, u, v), all (K, TILE).  The single block-MT definition shared by
    :func:`_mt8` and :func:`_hit8`'s "mt" branch."""
    ox, oy, oz = oxyz
    dx, dy, dz = dxyz
    p0x, p0y, p0z = tb[:, 0:1], tb[:, 1:2], tb[:, 2:3]
    e1x, e1y, e1z = tb[:, 3:4], tb[:, 4:5], tb[:, 5:6]
    e2x, e2y, e2z = tb[:, 6:7], tb[:, 7:8], tb[:, 8:9]
    pvx = dy * e2z - dz * e2y            # (K, TILE)
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv = jnp.where(det != 0.0, 1.0 / det, 0.0)
    tx = ox - p0x
    ty = oy - p0y
    tz = oz - p0z
    u = (tx * pvx + ty * pvy + tz * pvz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    tt = (e2x * qx + e2y * qy + e2z * qz) * inv
    ok = (
        pred
        & (det != 0.0)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (tt > t_min)
    )
    return ok, tt, u, v


def _argmin_pick(ok, tt, best_t, k):
    """One vectorized min-reduce over a (K, TILE) block plus a lowest-row
    tie-break — picks the same winner as the sequential strict-< latch
    (first of equal-t rows) in ~1/3 the vector ops.  Returns (upd, tmin,
    pick) where ``pick(x)`` selects the winning row's values per lane."""
    big = jnp.float32(jnp.inf)
    ttm = jnp.where(ok & (tt < best_t[None, :]), tt, big)   # (K, TILE)
    tmin = jnp.min(ttm, axis=0)                             # (TILE,)
    upd = tmin < best_t
    posf = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0).astype(jnp.float32)
    cand = jnp.where(ttm == tmin[None, :], jnp.broadcast_to(posf, ttm.shape), big)
    pmin = jnp.min(cand, axis=0)                            # winning block row
    win = cand == pmin[None, :]
    pick = lambda x: jnp.sum(jnp.where(win, x, 0.0), axis=0)  # noqa: E731
    return upd, tmin, pick


def _mt8(tb, pred, dxyz, oxyz, t_min, best, row_ids, latch: str = "argmin"):
    """Vectorized Moller-Trumbore: K triangle rows x TILE lanes.

    ``tb``: (K, 24) block; ``pred``: (K, TILE) participation mask;
    ``best``: (t, u, v, i, orig) lane planes; ``row_ids``: (K, 1) f32 global
    row index of each block row (becomes best_i).

    ``latch`` selects how block hits fold into the per-lane best record:

    * ``"rows"`` — sequential per-row latch with strict ``<`` (the v1 order).
    * ``"argmin"`` — one vectorized min-reduce over the block plus a
      lowest-row tie-break, which picks the same winner as the sequential
      strict-< latch (first of equal-t rows) in ~1/3 the vector ops; all ops
      stay (K, TILE)-shaped instead of K separate (TILE,) row ops.
    """
    best_t, best_u, best_v, best_i, best_orig = best
    orig8 = tb[:, 9:10]
    ok, tt, u, v = _mt_block(tb, pred, dxyz, oxyz, t_min)
    if latch == "rows":
        for j in range(tb.shape[0]):
            okj = ok[j, :] & (tt[j, :] < best_t)
            best_t = jnp.where(okj, tt[j, :], best_t)
            best_u = jnp.where(okj, u[j, :], best_u)
            best_v = jnp.where(okj, v[j, :], best_v)
            best_i = jnp.where(okj, row_ids[j, 0], best_i)
            best_orig = jnp.where(okj, orig8[j, 0], best_orig)
        return best_t, best_u, best_v, best_i, best_orig

    # lowest-BLOCK-ROW-of-equal-t tie-break == the sequential strict-< latch
    # winner (block order, which for walk blocks is also global-row order)
    upd, tmin, pick = _argmin_pick(ok, tt, best_t, tb.shape[0])
    ridf = jnp.broadcast_to(row_ids.astype(jnp.float32), tt.shape)
    best_t = jnp.where(upd, tmin, best_t)
    best_u = jnp.where(upd, pick(u), best_u)
    best_v = jnp.where(upd, pick(v), best_v)
    best_i = jnp.where(upd, pick(ridf), best_i)
    best_orig = jnp.where(upd, pick(jnp.broadcast_to(orig8, tt.shape)), best_orig)
    return best_t, best_u, best_v, best_i, best_orig


def _hit8(tb, pred, dxyz, oxyz, t_min, best, row_ids, tritest="bw",
          latch="argmin", with_orig=False):
    """Slim block intersection: K triangle rows x TILE lanes -> (t, row).

    Only (best_t, best_row) latch in-kernel; u/v/material resolve happens
    outside via the row gather (resolve_window_payload), which removes ~1/3
    of the per-tested-row vector ops vs the full :func:`_mt8` latch.
    ``with_orig`` additionally latches the winning row's ORIGINAL triangle
    id (BW col 13 / MT col 9) so occlusion-target checks need no gather —
    ``best`` is then (t, row, orig).

    ``tritest``:
    * ``"bw"`` — Baldwin-Weber precomputed plane rows (layout.tris8bw,
      (K, 16)): t from one plane, u/v from two more at p = o + t*d.  No
      cross products in the hot loop (~20% fewer ops than MT).
    * ``"mt"`` — classic Moller-Trumbore on (K, 24) layout.tris8 rows.

    (An MXU formulation of the BW planes — (K, 4) @ (4, TILE) dot products —
    was measured 1.4-1.7x SLOWER than the VPU form at every leaf size: the
    division/acceptance/latch epilogue stays on the VPU over the full
    (K, TILE) matrix and the tiny-K matmuls never amortize MXU latency.
    See docs/ROADMAP.md negative results.)
    """
    ox, oy, oz = oxyz
    dx, dy, dz = dxyz
    if with_orig:
        best_t, best_i, best_orig = best
        orig_col = 13 if tritest == "bw" else 9
        origb = tb[:, orig_col:orig_col + 1]
    else:
        best_t, best_i = best
    if tritest == "bw":
        n0x, n0y, n0z, d0 = tb[:, 0:1], tb[:, 1:2], tb[:, 2:3], tb[:, 3:4]
        n1x, n1y, n1z, d1 = tb[:, 4:5], tb[:, 5:6], tb[:, 6:7], tb[:, 7:8]
        n2x, n2y, n2z, d2 = tb[:, 8:9], tb[:, 9:10], tb[:, 10:11], tb[:, 11:12]
        den = n0x * dx + n0y * dy + n0z * dz
        num = n0x * ox + n0y * oy + n0z * oz + d0
        inv = jnp.where(den != 0.0, 1.0 / den, 0.0)
        tt = -num * inv
        px = ox + tt * dx
        py = oy + tt * dy
        pz = oz + tt * dz
        u = n1x * px + n1y * py + n1z * pz + d1
        v = n2x * px + n2y * py + n2z * pz + d2
        ok = (
            pred
            & (den != 0.0)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (tt > t_min)
        )
    else:
        ok, tt, _, _ = _mt_block(tb, pred, dxyz, oxyz, t_min)
    if latch == "rows":
        for j in range(tb.shape[0]):
            okj = ok[j, :] & (tt[j, :] < best_t)
            best_t = jnp.where(okj, tt[j, :], best_t)
            best_i = jnp.where(okj, row_ids[j, 0], best_i)
            if with_orig:
                best_orig = jnp.where(okj, origb[j, 0], best_orig)
        if with_orig:
            return best_t, best_i, best_orig
        return best_t, best_i
    upd, tmin, pick = _argmin_pick(ok, tt, best_t, tb.shape[0])
    ridf = jnp.broadcast_to(row_ids.astype(jnp.float32), tt.shape)
    best_t = jnp.where(upd, tmin, best_t)
    best_i = jnp.where(upd, pick(ridf), best_i)
    if with_orig:
        best_orig = jnp.where(
            upd, pick(jnp.broadcast_to(origb, tt.shape)), best_orig
        )
        return best_t, best_i, best_orig
    return best_t, best_i


def _window_kernel(
    rays_ref,      # (8, TILE) f32: ox oy oz dx dy dz active t_max
    nodes_ref,     # (M8, 8) f32
    meta_ref,      # (M8+8, 4) i32 [miss, first*64+count, tri_start, 0]
    tris_ref,      # (T8, 16) f32 BW rows (col 12 = leaf id) or (T8, 24) MT
    *rest,         # [pre_ref if n_prepass] + [out_ref (8, TILE)]
                   # + [tscratch (2, mtblock, C), tsem (2,)] if hbm
    num_nodes: int,
    num_tris: int,
    t_min: float,
    n_prepass: int,
    chain: int,
    window: int = WINDOW,
    mtblock: int = 8,
    latch: str = "argmin",
    tritest: str = "bw",
    anchor: tuple = (0.0, 0.0, 0.0),
    mt_off: bool = False,   # diagnostic: skip leaf MT (results WRONG; timing only)
    hbm: bool = False,      # triangle table in HBM; MT blocks DMA'd into
                            # double-buffered VMEM scratch (production scale)
    with_orig: bool = False,  # also latch the winner's ORIGINAL tri id
                              # (out row 2) — the fused path+shadow walk's
                              # gather-free occlusion-target check
    with_counts: bool = False,  # lane-op accounting (utilization telemetry):
                                # out row 6 = triangle rows this lane's TILE
                                # tested (every lane pays each row — spent
                                # lane-ops), row 7 = rows where THIS lane's
                                # leaf predicate was true (useful lane-ops).
                                # Prepass rows count as tested, not useful
                                # (speculative priming).  VMEM path only.
):
    if with_counts and hbm:
        raise NotImplementedError("with_counts is VMEM-path telemetry only")
    if hbm:
        rest, tscratch, tsem = rest[:-2], rest[-2], rest[-1]
    if n_prepass:
        pre_ref, out_ref = rest
    else:
        (out_ref,) = rest
    ox = rays_ref[0, :]
    oy = rays_ref[1, :]
    oz = rays_ref[2, :]
    dx = rays_ref[3, :]
    dy = rays_ref[4, :]
    dz = rays_ref[5, :]
    act = rays_ref[6, :] > 0.0
    t_max = rays_ref[7, :]
    ix, iy, iz = safe_inverse(dx, dy, dz)
    if tritest == "bw" and anchor != (0.0, 0.0, 0.0):
        # BW plane constants are anchored at the scene-AABB center
        # (accel/layout.py bw_rows); evaluate them at o - anchor.  One
        # subtraction per tile — the slab tests and MT rows stay world-space.
        oxyz = (ox - anchor[0], oy - anchor[1], oz - anchor[2])
    else:
        oxyz = (ox, oy, oz)
    dxyz = (dx, dy, dz)

    tile = ox.shape[0]
    sent = jnp.int32(num_nodes)
    cur0 = jnp.where(act, jnp.int32(0), sent)
    zeros = jnp.zeros((tile,), jnp.float32)
    leaf_col = 21 if tritest == "mt" else 12
    best = (
        t_max,                                       # best_t (primed by cap)
        jnp.full((tile,), float(num_tris), jnp.float32),  # row (sentinel)
    )
    if with_orig:
        best = best + (jnp.full((tile,), -1.0, jnp.float32),)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (window, 1), 0)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (mtblock, 1), 0)

    # phase 0: big-triangle pre-pass (static 8-row blocks); the pre-pass
    # table carries the global row index in the leaf column
    pred_act = jnp.broadcast_to(act[None, :], (8, tile))
    for b in range(n_prepass // 8):
        tb = pre_ref[b * 8:(b + 1) * 8, :]
        best = _hit8(tb, pred_act, dxyz, oxyz, t_min, best,
                     tb[:, leaf_col:leaf_col + 1], tritest=tritest,
                     latch=latch, with_orig=with_orig)

    tested0 = jnp.full((tile,), float(n_prepass), jnp.float32)
    useful0 = jnp.zeros((tile,), jnp.float32)

    # phase 1: window walk
    def cond(c):
        return jnp.min(c[0]) < sent

    def body(c):
        if with_counts:
            cur, best, tested, useful = c
        else:
            cur, best = c
        best_t = best[0]
        w = jnp.min(cur) & ~jnp.int32(window - 1)
        nblk = nodes_ref[pl.ds(w, window), :]   # (W, 8)
        mblk = meta_ref[pl.ds(w, window), :]    # (W, 4)
        ids = w + iota_w                        # (W, 1)

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
        hitb = (enter <= exit_) & (exit_ > t_min) & (enter < best_t[None, :])

        count8 = mblk[:, 1:2] & 63             # (8, 1)
        isleaf8 = count8 > 0
        miss8 = jnp.broadcast_to(mblk[:, 0:1], hitb.shape)
        ids_b = jnp.broadcast_to(ids, hitb.shape)
        # next pointer per window row: internal-hit -> first child (id+1),
        # leaf-hit -> stick (MT below, then advance), miss -> escape link
        nxt8 = jnp.where(hitb, jnp.where(isleaf8, ids_b, ids_b + 1), miss8)

        # chain lanes through the window in-register (leaves stick)
        for _ in range(chain):
            mask = ids == cur[None, :]          # (8, TILE)
            stick = mask & isleaf8 & hitb
            move = mask & ~stick
            tgt = jnp.sum(jnp.where(move, nxt8, 0), axis=0)
            cur = jnp.where(jnp.any(move, axis=0), tgt, cur)

        # leaf MT over the contiguous triangle range of the *demanded* leaf
        # rows only (leaves where some lane is actually stuck) — the full
        # window range tests ~3x more triangles than any lane needs.
        # (Measured dead ends, r3: per-lane-sub-group MT at 1/G width — the
        # sub-unions DON'T shrink for diffuse wavefronts, and Mosaic cannot
        # re-merge lane vectors; cursor gap-skipping — the skip logic costs
        # more than the rare intra-window gaps save.  See docs/ROADMAP.md.)
        mask = ids == cur[None, :]
        demand8 = jnp.any(mask & isleaf8, axis=1, keepdims=True)  # (8, 1)
        first8 = mblk[:, 1:2] >> 6
        lo8 = jnp.where(demand8, first8, jnp.int32(2 ** 30))
        hi8 = jnp.where(demand8, first8 + count8, jnp.int32(0))
        t_lo = jnp.min(lo8)
        t_hi = jnp.max(hi8)
        a_lo = t_lo & ~jnp.int32(7)
        nblocks = jnp.maximum(
            jax.lax.div(t_hi - a_lo + mtblock - 1, jnp.int32(mtblock)),
            jnp.int32(0),
        )

        def mt_cond(ic):
            return ic[0] < nblocks

        def mt_test(tb, r0, bst):
            leafid = tb[:, leaf_col:leaf_col + 1].astype(jnp.int32)  # (B, 1)
            pred = leafid == cur[None, :]
            row_ids = (r0 + iota_b).astype(jnp.float32)
            nb = _hit8(tb, pred, dxyz, oxyz, t_min, bst, row_ids,
                       tritest=tritest, latch=latch, with_orig=with_orig)
            if with_counts:
                return nb, jnp.sum(pred.astype(jnp.float32), axis=0)
            return nb, None

        def mt_body(ic):
            if with_counts:
                i, bst, tst, usf = ic
                r0 = a_lo + i * mtblock
                tb = tris_ref[pl.ds(r0, mtblock), :]
                nb, up = mt_test(tb, r0, bst)
                return i + 1, nb, tst + float(mtblock), usf + up
            i, bst = ic
            r0 = a_lo + i * mtblock
            tb = tris_ref[pl.ds(r0, mtblock), :]
            return i + 1, mt_test(tb, r0, bst)[0]

        # HBM variant: the triangle table never enters VMEM whole — each
        # demanded mtblock is DMA'd into double-buffered scratch, with the
        # next block's copy in flight while the current block's plane tests
        # run (the canonical Pallas double-buffering pattern).  This is what
        # removes the ~140K-triangle VMEM ceiling.
        def mt_dma(i, slot):
            return pltpu.make_async_copy(
                tris_ref.at[pl.ds(a_lo + i * mtblock, mtblock), :],
                tscratch.at[slot],
                tsem.at[slot],
            )

        def mt_body_hbm(ic):
            i, bst = ic
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < nblocks)
            def _():
                mt_dma(i + 1, 1 - slot).start()

            mt_dma(i, slot).wait()
            return i + 1, mt_test(tscratch[slot], a_lo + i * mtblock, bst)[0]

        if not mt_off:
            if hbm:
                @pl.when(nblocks > 0)
                def _():
                    mt_dma(jnp.int32(0), jnp.int32(0)).start()

                _, best = jax.lax.while_loop(
                    mt_cond, mt_body_hbm, (jnp.int32(0), best))
            elif with_counts:
                _, best, tested, useful = jax.lax.while_loop(
                    mt_cond, mt_body, (jnp.int32(0), best, tested, useful))
            else:
                _, best = jax.lax.while_loop(
                    mt_cond, mt_body, (jnp.int32(0), best))

        # advance lanes off their (tested) leaf rows
        onleaf = mask & isleaf8
        leafstep = jnp.sum(jnp.where(onleaf, miss8, 0), axis=0)
        cur = jnp.where(jnp.any(onleaf, axis=0), leafstep, cur)
        if with_counts:
            return cur, best, tested, useful
        return cur, best

    if with_counts:
        carry = jax.lax.while_loop(cond, body, (cur0, best, tested0, useful0))
        best = carry[1]
    else:
        best = jax.lax.while_loop(cond, body, (cur0, best))[1]
    out_ref[0, :] = best[0]
    out_ref[1, :] = best[1]
    if with_orig:
        out_ref[2, :] = best[2]
    for k in range(3 if with_orig else 2, 6):
        out_ref[k, :] = zeros
    if with_counts:
        out_ref[6, :] = carry[2]
        out_ref[7, :] = carry[3]
    else:
        out_ref[6, :] = zeros
        out_ref[7, :] = zeros


def intersect_bvh_window(
    o: jnp.ndarray,
    d: jnp.ndarray,
    lay: BVHLayout,
    t_min: float = 0.0,
    active=None,
    tile: int = DEFAULT_TILE,
    t_max=None,
    resolve: bool = True,
    prepass: int = 32,
    chain: int = CHAIN,
    window: int = WINDOW,
    mtblock: int = 8,
    latch: str = "argmin",
    tritest: str = "bw",
    mt_off: bool = False,
    raw: bool = False,
    gather: str = "rows",
    hbm: bool = False,
    with_orig: bool = False,
    with_counts: bool = False,
) -> HitShade:
    """Window-walk traversal (v2): o/d (3, N) rays -> HitShade.
    ``raw`` returns the unresolved ((8, N) [t, row] rows, t_max) pair instead
    (row 2 = original tri id when ``with_orig``; rows 6/7 = tested/useful
    lane-op counters when ``with_counts`` — utilization telemetry).

    ``hbm`` keeps the triangle table in HBM (``pl.ANY``) and streams
    demanded MT blocks through double-buffered VMEM scratch — the
    production-scale mode for scenes past the VMEM table budget (the node
    tables, ~48 B/node, stay VMEM-resident to ~10M+ triangles).

    Same hits as :func:`intersect_bvh_pallas` (``tritest="bw"`` computes t
    with the Baldwin-Weber plane form, so near-exact shared-edge ties may
    pick the other coplanar triangle); u/v and the shading payload are
    recomputed outside the kernel from the winning row's gather.
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
    rays = jnp.concatenate([o, d, act[None], t_max_arr[None]], axis=0)
    if pad:
        rays = jnp.pad(rays, ((0, 0), (0, pad)))
    total = n + pad
    grid = total // tile

    prepass = min(prepass, lay.prepass.shape[0], lay.num_tris)
    prepass -= prepass % 8  # static 8-row blocks
    kernel = functools.partial(
        _window_kernel,
        num_nodes=lay.num_nodes,
        num_tris=lay.num_tris,
        t_min=t_min,
        n_prepass=prepass,
        chain=chain,
        window=window,
        mtblock=mtblock,
        latch=latch,
        tritest=tritest,
        anchor=lay.anchor,
        mt_off=mt_off,
        hbm=hbm,
        with_orig=with_orig,
        with_counts=with_counts,
    )
    tris_tab = lay.tris8 if tritest == "mt" else lay.tris8bw
    pre_tab = lay.prepass if tritest == "mt" else lay.prepassbw
    in_specs = [
        pl.BlockSpec((8, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pl.ANY if hbm else pltpu.VMEM),
    ]
    inputs = [rays, lay.nodes8, lay.meta4, tris_tab]
    if prepass:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(pre_tab[:prepass])
    scratch_shapes = []
    if hbm:
        scratch_shapes = [
            pltpu.VMEM((2, mtblock, tris_tab.shape[1]), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, total), jnp.float32),
        scratch_shapes=scratch_shapes,
    )(*inputs)

    if raw:
        return out[:, :n], t_max_arr
    return resolve_window_payload(lay, out[:, :n], t_max_arr, o, d,
                                  resolve=resolve, gather=gather)


def resolve_window_payload(
    lay: BVHLayout, out: jnp.ndarray, t_max_arr, o, d, resolve: bool = True,
    gather: str = "rows",
) -> HitShade:
    """Raw kernel rows [t, row, ...] -> HitShade.

    The kernel latches only (best_t, best_row) — ~1/3 fewer vector ops per
    tested triangle row than carrying u/v/orig through every latch.  Here
    ONE XLA row gather fetches the winning triangle and u/v are recomputed
    per lane (identical Moller-Trumbore arithmetic to the v1 kernel; the
    sentinel row is all zeros -> det == 0 -> u = v = 0 on misses).

    ``gather`` selects the gather lowering (cfg.resolve_gather; A/B'd by
    scripts/perf_gather_probe.py — the row gather is the biggest single
    linear-stage item at ~31 ms/2M rows on v5e):
      "rows"    one (N, C) row gather from the (T, C) table (baseline);
      "cols"    one (C, N) gather along axis 1 of the transposed table;
      "percol"  C independent 1D takes from the transposed table's rows.
    All three are element-identical; only the XLA lowering differs.
    """
    n = out.shape[1]
    t = jnp.where(out[0] < t_max_arr, out[0], jnp.inf)
    # ONE row gather serves the whole resolve; with cfg.bake_materials the
    # wider table also carries the hit material's constants (columns 24..) —
    # the gather's cost is per row, flat in width, so the material payload
    # rides free and the select_cols chains in the shading core disappear.
    table = lay.tris if (lay.triswide is None or not resolve) else lay.triswide
    idx = out[1].astype(jnp.int32)
    if gather == "cols":
        rows_t = jnp.take(table.T, idx, axis=1)          # (C, N)
        col = lambda k: rows_t[k]
    elif gather == "percol":
        table_t = table.T
        col = lambda k: jnp.take(table_t[k], idx)
    else:
        rows = jnp.take(table, idx, axis=0)              # (N, 24+K)
        col = lambda k: rows[:, k]
    e1 = (col(3), col(4), col(5))
    e2 = (col(6), col(7), col(8))
    pvx = d[1] * e2[2] - d[2] * e2[1]
    pvy = d[2] * e2[0] - d[0] * e2[2]
    pvz = d[0] * e2[1] - d[1] * e2[0]
    det = e1[0] * pvx + e1[1] * pvy + e1[2] * pvz
    inv = jnp.where(det != 0.0, 1.0 / det, 0.0)
    tx = o[0] - col(0)
    ty = o[1] - col(1)
    tz = o[2] - col(2)
    u = (tx * pvx + ty * pvy + tz * pvz) * inv
    qx = ty * e1[2] - tz * e1[1]
    qy = tz * e1[0] - tx * e1[2]
    qz = tx * e1[1] - ty * e1[0]
    v = (d[0] * qx + d[1] * qy + d[2] * qz) * inv
    hit_ok = jnp.isfinite(t)
    u = jnp.where(hit_ok, jnp.clip(u, 0.0, 1.0), 0.0)
    v = jnp.where(hit_ok, jnp.clip(v, 0.0, 1.0), 0.0)
    if not resolve:
        return HitShade(
            t=t, u=u, v=v,
            tri=col(9).astype(jnp.int32),
            mat=jnp.zeros((n,), jnp.int32),
            light=jnp.full((n,), -1, jnp.int32),
            pos=jnp.zeros((3, n), jnp.float32),
            normal=jnp.zeros((3, n), jnp.float32),
        )
    w0 = 1.0 - u - v
    px = col(0) + u * col(3) + v * col(6)
    py = col(1) + u * col(4) + v * col(7)
    pz = col(2) + u * col(5) + v * col(8)
    nx = col(10) * w0 + col(13) * u + col(16) * v
    ny = col(11) * w0 + col(14) * u + col(17) * v
    nz = col(12) * w0 + col(15) * u + col(18) * v
    rlen = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-20))
    mataux = None
    if lay.triswide is not None:
        s, has_rough = lay.matmeta
        mataux = {
            "diffuse": jnp.stack([col(24 + j) for j in range(s)]),
            "emissive": jnp.stack([col(24 + s + j) for j in range(s)]),
            "ior": col(24 + 2 * s),
            "mtype": col(25 + 2 * s).astype(jnp.int32),
        }
        if has_rough:
            mataux["rough"] = col(26 + 2 * s)
    return HitShade(
        t=t, u=u, v=v,
        tri=col(9).astype(jnp.int32),
        mat=col(19).astype(jnp.int32),
        light=col(20).astype(jnp.int32) - 1,
        pos=jnp.stack([px, py, pz]),
        normal=jnp.stack([nx * rlen, ny * rlen, nz * rlen]),
        mataux=mataux,
    )


# =====================================================================
# Dense-sweep kernel (v3 candidate for incoherent wavefronts)
# =====================================================================
# Measured motivation (docs/ROADMAP.md, round-4 ablation): on the bundled
# scenes a sorted 768-lane diffuse tile demands 100-150 of the scene's ~127
# leaves — the window walk already sweeps nearly the whole triangle table,
# paying box tests, chain logic and while-loop step overhead to *decide* to
# do so.  The sweep kernel drops navigation entirely: one perfectly regular
# march over every triangle block, all lanes, maximal block-op density.
# Cost is exactly lanes x triangles, so it can only win for small scenes
# (the VMEM-resident regime) on wavefronts whose tile unions approach the
# whole tree; camera tiles and range-capped occlusion walks keep the
# demand-driven kernels.


def _sweep_kernel(
    rays_ref,      # (8, TILE) f32: ox oy oz dx dy dz active t_max
    tris_ref,      # (T8, 16) f32 BW rows or (T8, 24) MT rows
    out_ref,       # (8, TILE) f32: [t, row, (orig), 0...]
    *,
    num_tris: int,
    nblocks: int,
    t_min: float,
    mtblock: int,
    latch: str,
    tritest: str,
    anchor: tuple,
    with_orig: bool,
):
    ox = rays_ref[0, :]
    oy = rays_ref[1, :]
    oz = rays_ref[2, :]
    dx = rays_ref[3, :]
    dy = rays_ref[4, :]
    dz = rays_ref[5, :]
    act = rays_ref[6, :] > 0.0
    t_max = rays_ref[7, :]
    if tritest == "bw" and anchor != (0.0, 0.0, 0.0):
        oxyz = (ox - anchor[0], oy - anchor[1], oz - anchor[2])
    else:
        oxyz = (ox, oy, oz)
    dxyz = (dx, dy, dz)

    tile = ox.shape[0]
    zeros = jnp.zeros((tile,), jnp.float32)
    best = (t_max, jnp.full((tile,), float(num_tris), jnp.float32))
    if with_orig:
        best = best + (jnp.full((tile,), -1.0, jnp.float32),)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (mtblock, 1), 0)
    # inactive lanes keep the sentinel row: predicate every test on act
    # (sentinel/pad rows also self-reject via det/den == 0)
    pred = jnp.broadcast_to(act[None, :], (mtblock, tile))

    def body(i, bst):
        r0 = i * mtblock
        tb = tris_ref[pl.ds(r0, mtblock), :]
        row_ids = (r0 + iota_b).astype(jnp.float32)
        return _hit8(tb, pred, dxyz, oxyz, t_min, bst, row_ids,
                     tritest=tritest, latch=latch, with_orig=with_orig)

    best = jax.lax.fori_loop(0, nblocks, body, best)
    out_ref[0, :] = best[0]
    out_ref[1, :] = best[1]
    if with_orig:
        out_ref[2, :] = best[2]
    for k in range(3 if with_orig else 2, 8):
        out_ref[k, :] = zeros


def intersect_bvh_sweep(
    o: jnp.ndarray,
    d: jnp.ndarray,
    lay: BVHLayout,
    t_min: float = 0.0,
    active=None,
    tile: int = 6144,
    t_max=None,
    resolve: bool = True,
    mtblock: int = 56,
    latch: str = "argmin",
    tritest: str = "bw",
    raw: bool = False,
    gather: str = "rows",
    with_orig: bool = False,
) -> HitShade:
    """Navigation-free dense sweep: o/d (3, N) rays -> HitShade.

    Same hit semantics as :func:`intersect_bvh_window` (identical
    ``_hit8`` tests over the same rows, best-t latch with lowest-row
    tie-break == the walk's DFS-order strict-< latch); only the order in
    which rows are *considered* differs, which the latch makes irrelevant.
    """
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

    tris_tab = lay.tris8 if tritest == "mt" else lay.tris8bw
    # cover the real rows + sentinel; pad rows self-reject (den/det == 0).
    # The layout's +72 pad rows are sized for the window kernel's fetches,
    # so a fat mtblock can overrun them on unlucky scene sizes — extend with
    # zero rows (which also self-reject) instead of asserting.
    nblocks = -(-(lay.num_tris + 1) // mtblock)
    overrun = nblocks * mtblock - tris_tab.shape[0]
    if overrun > 0:
        tris_tab = jnp.concatenate(
            [tris_tab, jnp.zeros((overrun, tris_tab.shape[1]),
                                 tris_tab.dtype)], axis=0)
    kernel = functools.partial(
        _sweep_kernel,
        num_tris=lay.num_tris,
        nblocks=nblocks,
        t_min=t_min,
        mtblock=mtblock,
        latch=latch,
        tritest=tritest,
        anchor=lay.anchor,
        with_orig=with_orig,
    )
    out = pl.pallas_call(
        kernel,
        grid=(total // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, total), jnp.float32),
    )(rays, tris_tab)
    if raw:
        return out[:, :n], t_max_arr
    return resolve_window_payload(lay, out[:, :n], t_max_arr, o, d,
                                  resolve=resolve, gather=gather)


def _block_interleave(a: jnp.ndarray, b: jnp.ndarray, block: int) -> jnp.ndarray:
    """Interleave two (..., N) arrays into (..., 2N), alternating
    ``block``-lane chunks (a[0:B], b[0:B], a[B:2B], ...).  ``block`` must
    divide N."""
    n = a.shape[-1]
    nb = n // block
    stacked = jnp.stack(
        [a.reshape(a.shape[:-1] + (nb, block)),
         b.reshape(b.shape[:-1] + (nb, block))],
        axis=-2,
    )
    return stacked.reshape(a.shape[:-1] + (2 * n,))


def _block_deinterleave(x: jnp.ndarray, block: int):
    """Inverse of :func:`_block_interleave`: (..., 2N) -> two (..., N)."""
    n2 = x.shape[-1]
    nb = n2 // (2 * block)
    r = x.reshape(x.shape[:-1] + (nb, 2, block))
    a = r[..., 0, :].reshape(x.shape[:-1] + (n2 // 2,))
    b = r[..., 1, :].reshape(x.shape[:-1] + (n2 // 2,))
    return a, b


def make_pallas_intersector(
    lay: BVHLayout,
    lay_occl: BVHLayout | None = None,
    t_min: float = 0.0,
    tile: int = DEFAULT_TILE,
    kernel: str = "window",
    chain: int = CHAIN,
    prepass: int = 32,
    mtblock: int = 56,
    occlusion_tile: int = 3072,
    secondary_tile: int = 768,
    secondary_window: int = 16,
    secondary_mtblock: int = 16,
    secondary_chain: int = 6,
    tritest: str = "bw",
    anyhit: bool = True,
    eps: float = 1e-4,
    gather: str = "rows",
    hbm: bool = False,
    sweep_tile: int = 6144,
    sweep_mtblock: int = 56,
):
    """Build the production intersection callable.

    Three query classes get separately tuned kernel parameters (A/B'd on v5e,
    scripts/perf_window_ab.py):

    * coherent nearest-hit (camera rays): big tiles win (the tile union is
      near the per-ray set, so fewer programs amortize per-step cost);
    * incoherent nearest-hit (bounce wavefronts): smaller tiles + 16-node
      windows + 16-row MT blocks win;
    * occlusion (t_max-capped shadow rays): the v1 min-walk without payload
      resolve, big tiles, optionally its own small-leaf layout
      (``lay_occl`` — the range cap prunes most leaves, so smaller blocks
      waste fewer lane-ops per demanded leaf).
    """
    occl = lay_occl if lay_occl is not None else lay

    def fn(o, d, active, t_max=None, coherent=False):
        if t_max is not None:
            if hbm:
                # production scale: capped nearest-hit through the HBM window
                # kernel (the v1 occlusion form needs the whole triangle
                # table in VMEM); wavefront.occlusion_clear applies the
                # nearest-hit-must-be-target semantics to the result
                return intersect_bvh_window(
                    o, d, lay, t_min=t_min, active=active,
                    tile=occlusion_tile, t_max=t_max, resolve=False,
                    prepass=prepass, chain=chain, mtblock=mtblock,
                    tritest=tritest, gather=gather, hbm=True,
                )
            # capped occlusion-style query (shadow rays): v1 kernel skips the
            # payload resolve and the cap prunes subtrees beyond the light
            return intersect_bvh_pallas(
                o, d, occl, t_min=t_min, active=active, tile=occlusion_tile,
                t_max=t_max, resolve=False, prepass=0,
            )
        if kernel in ("window", "sweep") or hbm:
            if coherent:
                return intersect_bvh_window(
                    o, d, lay, t_min=t_min, active=active, tile=tile,
                    prepass=prepass, chain=chain, mtblock=mtblock,
                    tritest=tritest, gather=gather, hbm=hbm,
                )
            if kernel == "sweep" and not hbm:
                # incoherent wavefronts only: their tile unions approach the
                # whole tree, so navigation buys nothing (module comment)
                return intersect_bvh_sweep(
                    o, d, lay, t_min=t_min, active=active, tile=sweep_tile,
                    mtblock=sweep_mtblock, tritest=tritest, gather=gather,
                )
            return intersect_bvh_window(
                o, d, lay, t_min=t_min, active=active, tile=secondary_tile,
                prepass=prepass, chain=secondary_chain,
                window=secondary_window, mtblock=secondary_mtblock,
                tritest=tritest, gather=gather, hbm=hbm,
            )
        return intersect_bvh_pallas(
            o, d, lay, t_min=t_min, active=active, tile=tile, prepass=prepass,
        )

    def fused(o, d, alive, sdir, sok, scap, target):
        """ONE 2N-lane walk serving the path nearest-hit AND the NEE
        occlusion query departing the same hit points (cfg.fuse_shadow_walk).

        Path/shadow lanes interleave at half-tile blocks, so every traversal
        tile holds a sorted run of path lanes plus their own shadow lanes —
        near-identical tile unions, paid once.  Shadow lanes seed best_t
        with their range cap; visibility resolves gather-free from the
        kernel-latched original tri id (the reference's nearest-hit-must-be-
        target check, renderer/Shaders.metal:214-231).  Returns
        (HitShade for the path lanes, (N,) bool ``clear``).
        """
        n = o.shape[1]
        block = max(secondary_tile // 2, 1)
        while block > 1 and n % block:
            block //= 2
        inf = jnp.full((n,), jnp.inf, jnp.float32)
        scapf = jnp.broadcast_to(scap, (n,)).astype(jnp.float32)
        o2 = _block_interleave(o, o, block)
        d2 = _block_interleave(d, sdir, block)
        act2 = _block_interleave(
            alive.astype(jnp.float32), sok.astype(jnp.float32), block
        )
        cap2 = _block_interleave(inf, scapf, block)
        if kernel == "sweep" and not hbm:
            raw_out, _ = intersect_bvh_sweep(
                o2, d2, lay, t_min=t_min, active=act2, tile=sweep_tile,
                t_max=cap2, mtblock=sweep_mtblock, tritest=tritest,
                raw=True, with_orig=True,
            )
        else:
            raw_out, _ = intersect_bvh_window(
                o2, d2, lay, t_min=t_min, active=act2, tile=secondary_tile,
                t_max=cap2, raw=True, prepass=prepass, chain=secondary_chain,
                window=secondary_window, mtblock=secondary_mtblock,
                tritest=tritest, hbm=hbm, with_orig=True,
            )
        outp, outs = _block_deinterleave(raw_out, block)
        hit = resolve_window_payload(
            lay, outp, inf, o, d, resolve=True, gather=gather
        )
        ts = outs[0]
        origs = outs[2]
        s_hit = ts < scapf  # latched a nearest hit inside the range cap
        clear = sok & jnp.where(
            target >= 0,
            s_hit & (ts >= eps) & (origs == target.astype(jnp.float32)),
            jnp.logical_not(s_hit),
        )
        return hit, clear

    fn.fused = fused

    if anyhit and not hbm:
        def occlusion(o, d, active, t_max, target):
            return occlusion_clear_anyhit(
                o, d, occl, active, t_max, target, eps=eps, t_min=t_min,
                tile=occlusion_tile,
            )

        fn.occlusion = occlusion
    return fn
