"""Traversal perf lab: A/B timing of intersector variants on the real chip.

Builds a realistic workload: primary camera rays at 1080p on the
CornellBox-Water-plastic scene, plus a *diffuse-bounce* wavefront made by
tracing the primaries and cosine-sampling new directions at the hit points
(then sorted with the production wavefront sort key).  Variants are timed
interleaved in one process (relay variance is ~±20% across processes; A/B
inside one process is the only trustworthy comparison).

Usage: timeout 580 python scripts/perf_traverse.py [--reps 5] > log 2>&1
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu_pathtracer.accel import build_layout  # noqa: E402
from tpu_pathtracer.config import RenderConfig  # noqa: E402
from tpu_pathtracer.core.sampling import generate_diffuse_bounce  # noqa: E402
from tpu_pathtracer.models.camera import Camera, generate_rays_flat  # noqa: E402
from tpu_pathtracer.render.order import make_order  # noqa: E402
from tpu_pathtracer.render.noise import pids_from_order  # noqa: E402
from tpu_pathtracer.render.wavefront import (  # noqa: E402
    PathState,
    initial_path_state,
    sort_wavefront,
)
from tpu_pathtracer.scene import load_scene, scene_path  # noqa: E402

W, H = 1920, 1080


def make_workloads(scene, lay, intersect):
    """Returns dict name -> (o, d, active, t_max) device arrays."""
    order = make_order(H, W, 0, 1536)
    pids = pids_from_order(order, W)
    cam = Camera.reference_default()
    jitter = jnp.zeros((2, H * W), jnp.float32)
    o, d = generate_rays_flat(cam, order.rows, order.cols, jitter, H, W)

    hit = jax.jit(lambda o, d: intersect(o, d, jnp.ones((o.shape[1],), bool)))(o, d)
    valid = jnp.isfinite(hit.t)
    key = jax.random.PRNGKey(7)
    u = jax.random.uniform(key, (2, o.shape[1]))
    nd = generate_diffuse_bounce(u, hit.normal)
    so = hit.pos + hit.normal * 1e-4

    st = initial_path_state(so, nd, 3, pids)
    st = st._replace(alive=valid)
    wmin = tuple(float(jnp.min(jnp.minimum(jnp.minimum(scene.p0[a], scene.p1[a]), scene.p2[a]))) for a in range(3))
    wmax = tuple(float(jnp.max(jnp.maximum(jnp.maximum(scene.p0[a], scene.p1[a]), scene.p2[a]))) for a in range(3))
    winv = tuple(1.0 / max(wmax[a] - wmin[a], 1e-6) for a in range(3))
    st_sorted = jax.jit(lambda s: sort_wavefront(s, wmin, winv))(st)

    act = jnp.ones((o.shape[1],), jnp.float32)

    # --- experimental sort key v2: mesh-entry-point morton ---
    # wall-only rays (whose segment ends on a big tri before reaching the
    # mesh AABB) sort into trivially cheap tiles; mesh-entering rays sort by
    # where they ENTER the mesh box + direction, localizing tile footprints.
    pre = np.asarray(lay.prepass)
    pre_rows = set(pre[:, 21].astype(int)[np.abs(pre).sum(1) > 0])
    tris = np.asarray(lay.tris)[:-1]
    mesh_rows = np.array([i for i in range(tris.shape[0]) if i not in pre_rows])
    mp0 = tris[mesh_rows, 0:3]
    mp1 = mp0 + tris[mesh_rows, 3:6]
    mp2 = mp0 + tris[mesh_rows, 6:9]
    allp = np.concatenate([mp0, mp1, mp2], 0)
    mbmin = jnp.asarray(allp.min(0))
    mbmax = jnp.asarray(allp.max(0))

    def key_v2(st):
        o_, d_ = st.origin, st.direction
        inv = jnp.where(jnp.abs(d_) > 1e-12, 1.0 / d_, jnp.inf)
        t0 = (mbmin[:, None] - o_) * inv
        t1 = (mbmax[:, None] - o_) * inv
        enter = jnp.max(jnp.minimum(t0, t1), axis=0)
        exit_ = jnp.min(jnp.maximum(t0, t1), axis=0)
        # nearest wall hit from the prepass set
        wall_t = jnp.full((o_.shape[1],), jnp.inf)
        for r in range(pre.shape[0]):
            tr = pre[r]
            if np.abs(tr).sum() == 0:
                continue
            e1 = jnp.asarray(tr[3:6]); e2 = jnp.asarray(tr[6:9]); p0 = jnp.asarray(tr[0:3])
            pv = jnp.cross(d_, jnp.broadcast_to(e2[:, None], d_.shape), axis=0)
            det = jnp.sum(e1[:, None] * pv, 0)
            invd = jnp.where(det != 0, 1.0 / det, 0.0)
            tv = o_ - p0[:, None]
            u = jnp.sum(tv * pv, 0) * invd
            qv = jnp.cross(tv, jnp.broadcast_to(e1[:, None], d_.shape), axis=0)
            v = jnp.sum(d_ * qv, 0) * invd
            tt = jnp.sum(e2[:, None] * qv, 0) * invd
            ok = (det != 0) & (u >= 0) & (v >= 0) & (u + v <= 1) & (tt > 1e-4)
            wall_t = jnp.where(ok & (tt < wall_t), tt, wall_t)
        enters = (enter <= exit_) & (exit_ > 0) & (enter < wall_t) & st.alive
        tent = jnp.maximum(enter, 0.0)
        e = o_ + d_ * tent[None]
        span = jnp.maximum(mbmax - mbmin, 1e-6)
        q = jnp.clip((e - mbmin[:, None]) / span[:, None] * 31.999, 0, 31.999)
        qi = q.astype(jnp.int32)
        from tpu_pathtracer.render.wavefront import _morton5
        mort = (_morton5(qi[0]) << 2) | (_morton5(qi[1]) << 1) | _morton5(qi[2])
        anorm = jnp.abs(d_[0]) + jnp.abs(d_[1]) + jnp.abs(d_[2])
        u_ = d_[0] / anorm
        v_ = d_[1] / anorm
        uo = jnp.where(d_[2] < 0, (1 - jnp.abs(v_)) * jnp.sign(u_), u_)
        vo = jnp.where(d_[2] < 0, (1 - jnp.abs(u_)) * jnp.sign(v_), v_)
        qu = jnp.clip((uo * 0.5 + 0.5) * 16, 0, 15).astype(jnp.int32)
        qv2 = jnp.clip((vo * 0.5 + 0.5) * 16, 0, 15).astype(jnp.int32)
        octa = (qu << 4) | qv2
        dead = jnp.logical_not(st.alive).astype(jnp.int32)
        key = (dead << 30) | (jnp.logical_not(enters).astype(jnp.int32) << 29) \
            | jnp.where(enters, (mort << 8) | octa, octa)
        return key

    def sort_v2(st):
        key = key_v2(st)
        planes = [st.origin[0], st.origin[1], st.origin[2],
                  st.direction[0], st.direction[1], st.direction[2],
                  st.alive.astype(jnp.int8)]
        out = jax.lax.sort((key, st.pixel, *planes), num_keys=2)
        p = out[2:]
        return st._replace(
            origin=jnp.stack(p[0:3]), direction=jnp.stack(p[3:6]),
            alive=p[6].astype(bool), pixel=out[1])

    st = initial_path_state(so, nd, 3, pids)
    st = st._replace(alive=valid)
    st_v2 = jax.jit(sort_v2)(st)

    return {
        "primary": (o, d, act, None),
        "diffuse_sorted": (
            st_sorted.origin, st_sorted.direction,
            st_sorted.alive.astype(jnp.float32), None,
        ),
        "diffuse_meshsort": (
            st_v2.origin, st_v2.direction,
            st_v2.alive.astype(jnp.float32), None,
        ),
    }


def time_variant(fn, args, reps):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])  # sync (relay needs D2H)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--scene", default="CornellBox-Water-plastic")
    args = ap.parse_args()

    scene = load_scene(scene_path(args.scene))
    lay = build_layout(scene)
    from tpu_pathtracer.ops.pallas_traverse import intersect_bvh_pallas

    base = jax.jit(
        lambda o, d, a: intersect_bvh_pallas(o, d, lay, active=a)
    )
    workloads = make_workloads(
        scene, lay, lambda o, d, a: intersect_bvh_pallas(o, d, lay, active=a)
    )

    variants = {}
    for tile in (768, 1536):
        for prepass in (0, 32):
            name = f"tile{tile}_pre{prepass}"
            variants[name] = jax.jit(
                lambda o, d, a, _t=tile, _p=prepass: intersect_bvh_pallas(
                    o, d, lay, active=a, tile=_t, prepass=_p
                )
            )

    n = W * H
    results = {}
    for wname, (o, d, a, _) in workloads.items():
        for vname, fn in variants.items():
            tmin, tmed = time_variant(fn, (o, d, a), args.reps)
            mrays = n / tmin / 1e6
            results[(wname, vname)] = (tmin, mrays)
            print(f"{wname:16s} {vname:18s} best {tmin*1e3:8.2f} ms  "
                  f"med {tmed*1e3:8.2f} ms  {mrays:8.1f} Mrays/s", flush=True)

    # correctness cross-check: prepass must not change results
    o, d, a, _ = workloads["diffuse_sorted"]
    h0 = variants["tile1536_pre0"](o, d, a)
    h1 = variants["tile1536_pre32"](o, d, a)
    t0 = np.asarray(h0.t)
    t1 = np.asarray(h1.t)
    both = np.isfinite(t0) & np.isfinite(t1)
    same_valid = (np.isfinite(t0) == np.isfinite(t1)).mean()
    print(f"prepass parity: valid-match {same_valid:.6f}  "
          f"max|dt| {np.abs(t0[both]-t1[both]).max():.2e}  "
          f"tri-match {(np.asarray(h0.tri)==np.asarray(h1.tri))[both].mean():.6f}")


if __name__ == "__main__":
    main()
