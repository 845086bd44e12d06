"""A/B window-kernel variants on realistic 1080p workloads (scalar-sync timing).

Variants differ only in static kernel parameters; correctness is cross-checked
at the end (hit parity vs the baseline variant on the diffuse workload).
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
    ap.add_argument("--workloads", default="primary,diffuse_sorted")
    args = ap.parse_args()

    scene = load_scene(scene_path(args.scene))
    lay = build_layout(scene)
    workloads = make_workloads(
        scene, lay, lambda o, d, a: intersect_bvh_pallas(o, d, lay, active=a)
    )

    def wvar(lay_=None, **kw):
        ly = lay_ if lay_ is not None else lay

        def f(o, d, a):
            h = intersect_bvh_window(o, d, ly, active=a, **kw)
            return jnp.sum(h.t[::997]) + jnp.sum(h.u[::997])

        return jax.jit(f)

    variants = {
        "base_c6_w16_m16_t768": wvar(chain=6, window=16, mtblock=16, tile=768),
    }
    lays = {16: lay}
    for ls in (32, 48):
        lays[ls] = build_layout(scene, leaf_size=ls)
        variants[f"leaf{ls}_c6_w16_m16_t768"] = wvar(
            lay_=lays[ls], chain=6, window=16, mtblock=16, tile=768
        )

    # ---- occlusion workload: shadow rays from the diffuse hit points ----
    def occl_workloads():
        o, d, a, _ = workloads["diffuse_sorted"]
        # aim at a fixed point on the light with jitter; cap at the distance
        lp = jnp.array([0.0, 1.95, 1.2])[:, None]
        tl = lp - o
        dist = jnp.sqrt(jnp.sum(tl * tl, axis=0))
        tl = tl / jnp.maximum(dist, 1e-30)[None]
        return o, tl, a, dist + 4e-4

    oo, od, oa, ocap = occl_workloads()
    occl_variants = {}
    for nm, ls in [("v1_leaf16", 16), ("v1_leaf32", 32)]:
        ly = lays[ls]
        occl_variants[nm] = jax.jit(
            lambda o, d, a, c, ly=ly: jnp.sum(
                intersect_bvh_pallas(
                    o, d, ly, active=a, tile=3072, t_max=c,
                    resolve=False, prepass=0,
                ).t[::997]
            )
        )
    for nm, ls in [("win_leaf16", 16), ("win_leaf32", 32)]:
        ly = lays[ls]
        occl_variants[nm] = jax.jit(
            lambda o, d, a, c, ly=ly: jnp.sum(
                intersect_bvh_window(
                    o, d, ly, active=a, tile=3072, t_max=c,
                    resolve=False, window=16, mtblock=16, chain=6,
                ).t[::997]
            )
        )
    for nm, fn in occl_variants.items():
        t = timeit(fn, oo, od, oa, ocap, reps=args.reps)
        print(f"occlusion          {nm:22s} {t*1e3:8.2f} ms", flush=True)

    n = W * H
    for wname in args.workloads.split(","):
        o, d, a, _ = workloads[wname]
        for vname, fn in variants.items():
            t = timeit(fn, o, d, a, reps=args.reps)
            print(f"{wname:18s} {vname:22s} {t*1e3:8.2f} ms  "
                  f"{n/t/1e6:7.1f} Mrays/s", flush=True)

    # parity: all variants agree on hits for the diffuse workload
    o, d, a, _ = workloads["diffuse_sorted"]

    def hits(**kw):
        h = jax.jit(lambda o, d, a: intersect_bvh_window(o, d, lay, active=a, **kw))(o, d, a)
        return np.asarray(h.t[::97]), np.asarray(h.tri[::97])

    t0_, i0_ = hits(latch="rows")
    for kw in (dict(latch="argmin"), dict(latch="argmin", window=16, mtblock=16),
               dict(latch="argmin", tile=1536)):
        t1_, i1_ = hits(**kw)
        fin = np.isfinite(t0_)
        ok = (np.isfinite(t1_) == fin).all() and np.allclose(
            t0_[fin], t1_[fin], rtol=1e-5
        )
        match = (i0_[fin] == i1_[fin]).mean()
        print(f"parity {kw}: finite-ok={ok} tri-match={match:.5f}", flush=True)


if __name__ == "__main__":
    main()
