"""Bound the win available from leaf re-clustering, offline.

The window kernel's leaf-MT cost for a 768-lane tile is

    rows(tile) = sum over DEMANDED leaves of ceil(count / mtblock) * mtblock

(each demanded leaf runs full-width mtblock blocks).  Any leaf partition of
the DFS triangle order can at best shrink this to the per-TRIANGLE demand
union (leaf size 1, no block quantization) — so comparing

    rows_leaf  (current partition, block-quantized)
    rows_tri   (triangles whose AABB the lane segment crosses — the floor)

on a real sorted diffuse wavefront bounds what ROADMAP idea #2 ("SAH leaf
merge aimed at minimizing boxes-crossed-per-segment") could ever buy.
Demand here uses the lane's FINAL nearest-hit t as the segment cap — an
optimistic (lower-bound) model for both granularities, so the RATIO is the
meaningful output.  Pure numpy on CPU.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/.jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu_pathtracer.accel import build_layout  # noqa: E402
from tpu_pathtracer.core.sampling import generate_diffuse_bounce  # noqa: E402
from tpu_pathtracer.models.camera import Camera, generate_rays_flat  # noqa: E402
from tpu_pathtracer.ops.intersect import intersect_brute, shade_from_scene  # noqa: E402
from tpu_pathtracer.render.order import make_order  # noqa: E402
from tpu_pathtracer.render.wavefront import initial_path_state, sort_wavefront  # noqa: E402
from tpu_pathtracer.render.noise import pids_from_order  # noqa: E402
from tpu_pathtracer.scene import load_scene, scene_path  # noqa: E402

W, H = 640, 360
N = W * H
TILE = 768
MTBLOCK = 56


def segment_crosses(o, d, tmax, bmin, bmax):
    """(L, 3) lanes x (B, 3) boxes -> (L, B) bool: segment [0, tmax] crosses."""
    inv = np.where(np.abs(d) > 1e-12, 1.0 / d, np.inf)
    t0 = (bmin[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t1 = (bmax[None, :, :] - o[:, None, :]) * inv[:, None, :]
    enter = np.minimum(t0, t1).max(axis=2)
    exit_ = np.maximum(t0, t1).min(axis=2)
    return (enter <= exit_) & (exit_ > 1e-4) & (enter < tmax[:, None])


def main():
    scene = load_scene(scene_path("CornellBox-Water-plastic"))
    lay = build_layout(scene, leaf_size=56)
    counts = np.asarray(lay.tri_count)
    first = np.asarray(lay.first_tri)
    leaf_nodes = np.flatnonzero(counts > 0)
    leaf_bmin = np.asarray(lay.bmin).T[leaf_nodes]
    leaf_bmax = np.asarray(lay.bmax).T[leaf_nodes]
    leaf_count = counts[leaf_nodes]
    print(f"leaves={leaf_nodes.size} tris={lay.num_tris} "
          f"mean_leaf={leaf_count.mean():.1f}", flush=True)

    # per-triangle AABBs in DFS-sorted order
    p0 = np.asarray(lay.p0).T
    p1 = np.asarray(lay.p1).T
    p2 = np.asarray(lay.p2).T
    tri_bmin = np.minimum(np.minimum(p0, p1), p2)
    tri_bmax = np.maximum(np.maximum(p0, p1), p2)

    # real diffuse bounce wavefront, production sort
    order = make_order(H, W, 0, TILE)
    cam = Camera.reference_default()
    jitter = jnp.zeros((2, N), jnp.float32)
    o, d = generate_rays_flat(cam, order.rows, order.cols, jitter, H, W)
    hit = shade_from_scene(scene, intersect_brute(o, d, scene.p0, scene.p1, scene.p2))
    valid = jnp.isfinite(hit.t)
    u = jax.random.uniform(jax.random.PRNGKey(7), (2, N))
    nd = generate_diffuse_bounce(u, hit.normal)
    so = hit.pos + hit.normal * 1e-4
    pids = pids_from_order(order, W)
    st = initial_path_state(so, nd, 3, pids)._replace(alive=valid)
    wmin = tuple(float(jnp.min(jnp.minimum(jnp.minimum(scene.p0[a], scene.p1[a]),
                                           scene.p2[a]))) for a in range(3))
    wmax = tuple(float(jnp.max(jnp.maximum(jnp.maximum(scene.p0[a], scene.p1[a]),
                                           scene.p2[a]))) for a in range(3))
    winv = tuple(1.0 / max(wmax[a] - wmin[a], 1e-6) for a in range(3))
    sts = jax.jit(lambda s: sort_wavefront(s, wmin, winv))(st)
    so_s = np.asarray(sts.origin).T      # (N, 3) sorted
    sd_s = np.asarray(sts.direction).T
    alive_s = np.asarray(sts.alive)
    # true nearest-hit t per sorted lane (the optimistic segment cap)
    h2 = intersect_brute(sts.origin, sts.direction, scene.p0, scene.p1, scene.p2)
    t_s = np.asarray(h2.t)
    t_s = np.where(np.isfinite(t_s), t_s, 1e30)

    # prepass-primed t per sorted lane (what a NO-FEEDBACK demand pass can
    # use as its segment cap: the 32 biggest-triangle hits, not the final t)
    pre = np.asarray(lay.prepass)[:32]
    prime = np.full(N, 1e30, np.float32)
    for trow in pre:
        if np.abs(trow[:9]).sum() == 0:
            continue
        p0r, e1r, e2r = trow[0:3], trow[3:6], trow[6:9]
        pv = np.cross(sd_s, e2r[None, :])
        det = (pv * e1r[None, :]).sum(1)
        inv = np.where(det != 0, 1.0 / np.where(det == 0, 1, det), 0.0)
        tv = so_s - p0r[None, :]
        uu = (tv * pv).sum(1) * inv
        qv = np.cross(tv, e1r[None, :])
        vv = (sd_s * qv).sum(1) * inv
        tt = (qv * e2r[None, :]).sum(1) * inv
        ok = (det != 0) & (uu >= 0) & (vv >= 0) & (uu + vv <= 1) & (tt > 1e-4)
        prime = np.where(ok & (tt < prime), tt, prime)

    # packet boxes: P consecutive DFS rows per packet, for P in {8, 16}
    def packet_boxes(p):
        npk = -(-lay.num_tris // p)
        bmn = np.full((npk, 3), 1e30, np.float32)
        bmx = np.full((npk, 3), -1e30, np.float32)
        for k in range(npk):
            sl = slice(k * p, min((k + 1) * p, lay.num_tris))
            bmn[k] = tri_bmin[sl].min(0)
            bmx[k] = tri_bmax[sl].max(0)
        rows = np.full(npk, p, np.int64)
        rows[-1] = lay.num_tris - (npk - 1) * p
        return bmn, bmx, rows

    pk = {p: packet_boxes(p) for p in (8, 16)}

    # REAL small-leaf boxes (a leaf8 build): tight spatial clusters, 8-row
    # aligned — the natural demand unit for a two-pass compact sweep
    lay8 = build_layout(scene, leaf_size=8)
    c8 = np.asarray(lay8.tri_count)
    l8 = np.flatnonzero(c8 > 0)
    l8_bmin = np.asarray(lay8.bmin).T[l8]
    l8_bmax = np.asarray(lay8.bmax).T[l8]
    l8_rows = c8[l8].astype(np.int64)
    print(f"leaf8 build: {l8.size} leaves, mean {l8_rows.mean():.1f} rows")

    rng = np.random.default_rng(0)
    live_tiles = [g for g in range(N // TILE)
                  if alive_s[g * TILE:(g + 1) * TILE].mean() > 0.9]
    sample = rng.choice(live_tiles, size=min(24, len(live_tiles)), replace=False)

    acc = {k: 0 for k in ("leafq", "tri_f", "tri_p",
                          "p8_f", "p8_p", "p16_f", "p16_p")}
    per_tile_p8 = []
    for g in sample:
        sl = slice(g * TILE, (g + 1) * TILE)
        live = alive_s[sl]
        ol, dl = so_s[sl][live], sd_s[sl][live]
        tf, tp_ = t_s[sl][live], prime[sl][live]
        # leaf-granular demand, block-quantized (what the kernel pays now);
        # the walk has MT feedback, so use the FINAL t (optimistic for it)
        dem = segment_crosses(ol, dl, tf, leaf_bmin, leaf_bmax).any(0)
        acc["leafq"] += int((np.ceil(leaf_count[dem] / MTBLOCK) * MTBLOCK).sum())
        # triangle floor under both caps
        acc["tri_f"] += int(segment_crosses(ol, dl, tf, tri_bmin, tri_bmax)
                            .any(0).sum())
        acc["tri_p"] += int(segment_crosses(ol, dl, tp_, tri_bmin, tri_bmax)
                            .any(0).sum())
        # packet granularity (the two-pass compact-sweep design's demand
        # unit) under final-t (infeasible ideal) and primed-t (feasible)
        for p in (8, 16):
            bmn, bmx, rows = pk[p]
            acc[f"p{p}_f"] += int(
                rows[segment_crosses(ol, dl, tf, bmn, bmx).any(0)].sum())
            d = segment_crosses(ol, dl, tp_, bmn, bmx).any(0)
            acc[f"p{p}_p"] += int(rows[d].sum())
            if p == 8:
                per_tile_p8.append(int(rows[d].sum()))
        # real leaf8 boxes: demand rows quantized to 8-row fetches
        for cap, key in ((tf, "l8_f"), (tp_, "l8_p")):
            d = segment_crosses(ol, dl, cap, l8_bmin, l8_bmax).any(0)
            acc[key] = acc.get(key, 0) + int(
                (np.ceil(l8_rows[d] / 8) * 8).sum())
    n = len(sample)
    print(f"tiles sampled: {n} (live>90%)")
    print(f"rows/tile  leaf56 kernel cost (final-t):   {acc['leafq']/n:8.0f}")
    print(f"rows/tile  triangle floor final-t:         {acc['tri_f']/n:8.0f}")
    print(f"rows/tile  triangle floor primed-t:        {acc['tri_p']/n:8.0f}")
    print(f"rows/tile  packet8  final-t:               {acc['p8_f']/n:8.0f}")
    print(f"rows/tile  packet8  primed-t (FEASIBLE):   {acc['p8_p']/n:8.0f}")
    print(f"rows/tile  packet16 final-t:               {acc['p16_f']/n:8.0f}")
    print(f"rows/tile  packet16 primed-t (FEASIBLE):   {acc['p16_p']/n:8.0f}")
    print(f"rows/tile  REAL leaf8 final-t:             {acc['l8_f']/n:8.0f}")
    print(f"rows/tile  REAL leaf8 primed-t (FEASIBLE): {acc['l8_p']/n:8.0f}")
    pt8 = np.array(per_tile_p8)
    print(f"packet8 primed-t per-tile rows: p50 {np.percentile(pt8,50):.0f} "
          f"p90 {np.percentile(pt8,90):.0f} max {pt8.max()}")
    print(f"=> feasible two-pass win vs kernel: "
          f"{1 - acc['p8_p']/max(acc['leafq'],1):.1%} (packet8), "
          f"{1 - acc['l8_p']/max(acc['leafq'],1):.1%} (real leaf8)")


if __name__ == "__main__":
    main()
