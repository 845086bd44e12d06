"""A/B the leaf-MT granularity levers (mtgroups, gap_skip) on the real chip.

The round-2 measurement: the leaf Moller-Trumbore stage is ~90% of traversal
cost at ~4% lane utilization (each demanded leaf costs a full-tile-width block
op serving ~20 lanes).  These variants shrink the per-demanded-leaf cost by
running MT at 1/G lane width over per-sub-group demand ranges, and by jumping
the row cursor over undemanded leaf runs.

Usage: timeout 1200 python scripts/perf_mtgroups.py > log 2>&1
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
from tpu_pathtracer.ops.pallas_traverse import (  # noqa: E402
    intersect_bvh_pallas,
    intersect_bvh_window,
)
from tpu_pathtracer.scene import load_scene, scene_path  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from perf_traverse import make_workloads  # noqa: E402

W, H = 1920, 1080


def timeit(fn, *args, reps=5):
    out = fn(*args)
    float(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--scene", default="CornellBox-Water-plastic")
    ap.add_argument("--leaf-sizes", default="32")
    ap.add_argument("--occlusion", action="store_true")
    args = ap.parse_args()

    scene = load_scene(scene_path(args.scene))
    lay = build_layout(scene)
    workloads = make_workloads(
        scene, lay, lambda o, d, a: intersect_bvh_pallas(o, d, lay, active=a)
    )
    lays = {32: lay}
    for ls in (int(s) for s in args.leaf_sizes.split(",")):
        if ls not in lays:
            lays[ls] = build_layout(scene, leaf_size=ls)

    def wvar(ls=32, **kw):
        ly = lays[ls]

        def f(o, d, a):
            h = intersect_bvh_window(o, d, ly, active=a, **kw)
            return jnp.sum(h.t[::997]) + jnp.sum(h.u[::997])

        return jax.jit(f)

    base = dict(chain=6, window=16, mtblock=16, tile=768)
    variants = {
        "base_t768": wvar(**base),
        "gap_t768": wvar(**{**base, "gap_skip": True}),
        "g2_t768": wvar(**{**base, "mtgroups": 2}),
        "g2gap_t768": wvar(**{**base, "mtgroups": 2, "gap_skip": True}),
        "g3gap_t768": wvar(**{**base, "mtgroups": 3, "gap_skip": True}),
        "g6gap_t768": wvar(**{**base, "mtgroups": 6, "gap_skip": True}),
        "g6gap_t1536": wvar(**{**base, "tile": 1536, "mtgroups": 6,
                               "gap_skip": True}),
        "g12gap_t1536": wvar(**{**base, "tile": 1536, "mtgroups": 12,
                                "gap_skip": True}),
    }
    for ls in lays:
        if ls != 32:
            variants[f"g6gap_t768_leaf{ls}"] = wvar(
                ls=ls, **{**base, "mtgroups": 6, "gap_skip": True}
            )

    for wname in ("diffuse_sorted", "primary"):
        o, d, a, _ = workloads[wname]
        n = o.shape[1]
        for vname, fn in variants.items():
            t = timeit(fn, o, d, a, reps=args.reps)
            print(f"{wname:16s} {vname:20s} {t*1e3:8.2f} ms  "
                  f"{n/t/1e6:7.1f} Mrays/s", flush=True)

    if args.occlusion:
        o, d, a, _ = workloads["diffuse_sorted"]
        lp = jnp.array([0.0, 1.95, 1.2])[:, None]
        tl = lp - o
        dist = jnp.sqrt(jnp.sum(tl * tl, axis=0))
        tl = tl / jnp.maximum(dist, 1e-30)[None]
        cap = dist + 4e-4
        ovariants = {
            "v1_t3072": jax.jit(lambda o, d, a, c: jnp.sum(
                intersect_bvh_pallas(
                    o, d, lay, active=a, tile=3072, t_max=c,
                    resolve=False, prepass=0,
                ).t[::997])),
            "win_g6gap_t3072": jax.jit(lambda o, d, a, c: jnp.sum(
                intersect_bvh_window(
                    o, d, lay, active=a, tile=3072, t_max=c, resolve=False,
                    window=16, mtblock=16, chain=6, mtgroups=6, gap_skip=True,
                    prepass=0,
                ).t[::997])),
            "win_g12gap_t3072": jax.jit(lambda o, d, a, c: jnp.sum(
                intersect_bvh_window(
                    o, d, lay, active=a, tile=3072, t_max=c, resolve=False,
                    window=16, mtblock=16, chain=6, mtgroups=12, gap_skip=True,
                    prepass=0,
                ).t[::997])),
        }
        for nm, fn in ovariants.items():
            t = timeit(fn, o, tl, a, cap, reps=args.reps)
            print(f"occlusion        {nm:20s} {t*1e3:8.2f} ms", flush=True)

    # parity on the chip (not just interpreter): hits must match base
    o, d, a, _ = workloads["diffuse_sorted"]
    h0 = jax.jit(lambda o, d, a: intersect_bvh_window(
        o, d, lay, active=a, **base))(o, d, a)
    h1 = jax.jit(lambda o, d, a: intersect_bvh_window(
        o, d, lay, active=a, mtgroups=6, gap_skip=True, **base))(o, d, a)
    t0_, t1_ = np.asarray(h0.t[::97]), np.asarray(h1.t[::97])
    i0_, i1_ = np.asarray(h0.tri[::97]), np.asarray(h1.tri[::97])
    fin = np.isfinite(t0_)
    ok = (np.isfinite(t1_) == fin).all() and np.allclose(t0_[fin], t1_[fin])
    print(f"parity g6gap vs base: finite-ok={ok} "
          f"tri-match={(i0_[fin] == i1_[fin]).mean():.5f}", flush=True)


if __name__ == "__main__":
    main()
