"""Prepass / window-kernel parameter sweep on the PRODUCTION nearest-hit path.

The round-4 ablation (docs/ROADMAP.md) put traversal+resolve at ~81% of the
frame, and the walk's cost model is demand-side: best_t priming is what culls
subtrees, and the 32-row big-triangle prepass cannot prime rays that
terminate on the water mesh's small triangles.  This sweeps prepass depth
{0, 32, 64} (PREPASS_MAX=64, accel/layout.py) and re-checks the secondary
window/mtblock around the tuned point, on the same workloads
scripts/perf_traverse.py uses (1080p primaries + a sorted diffuse-bounce
wavefront), through intersect_bvh_window — the kernel the renderer actually
dispatches for nearest-hit queries.

Usage: timeout 1200 python scripts/perf_prepass.py > /tmp/prepass.log 2>&1
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from perf_traverse import W, H, make_workloads  # noqa: E402
from tpu_pathtracer.accel import build_layout  # noqa: E402
from tpu_pathtracer.ops.pallas_traverse import (  # noqa: E402
    intersect_bvh_pallas,
    intersect_bvh_window,
)
from tpu_pathtracer.scene import load_scene, scene_path  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--scene", default="CornellBox-Water-plastic")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)

    scene = load_scene(scene_path(args.scene))
    lay = build_layout(scene)
    workloads = make_workloads(
        scene, lay, lambda o, d, a: intersect_bvh_pallas(o, d, lay, active=a)
    )

    n = W * H

    # production shapes: coherent (tile 1536, win 8, mtblock 56, chain 4) and
    # secondary (tile 768, win 16, mtblock 16, chain 6) — config.py defaults.
    # Time via an ON-DEVICE scalar reduce (perf_window_ab's pattern): pulling
    # the (8, 2M) raw output D2H costs ~1.4 s through the relay and drowns
    # the ~220 ms walk (the first run of this script made that mistake).
    def coh(pre):
        return jax.jit(lambda o, d, a, _p=pre: jnp.sum(intersect_bvh_window(
            o, d, lay, active=a, tile=1536, prepass=_p, chain=4, window=8,
            mtblock=56, raw=True)[0][0, ::997]))

    def sec(pre, window=16, mtblock=16, chain=6, tile=768):
        return jax.jit(
            lambda o, d, a, _p=pre, _w=window, _m=mtblock, _c=chain, _t=tile:
            jnp.sum(intersect_bvh_window(
                o, d, lay, active=a, tile=_t, prepass=_p, chain=_c,
                window=_w, mtblock=_m, raw=True)[0][0, ::997]))

    def sec_raw(pre):
        return jax.jit(lambda o, d, a, _p=pre: intersect_bvh_window(
            o, d, lay, active=a, tile=768, prepass=_p, chain=6,
            window=16, mtblock=16, raw=True))

    def time_variant(fn, args, reps):
        out = fn(*args)
        float(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        import numpy as _np
        return min(ts), float(_np.median(ts))

    plan = []
    for pre in (0, 32, 64):
        plan.append((f"primary_pre{pre}", "primary", coh(pre)))
    for pre in (0, 32, 64):
        plan.append((f"diffuse_pre{pre}", "diffuse_sorted", sec(pre)))
    # window/mtblock re-check around the tuned point at the winning prepass
    for wdw, mtb in ((16, 24), (16, 32), (24, 16), (8, 16)):
        plan.append((f"diffuse_w{wdw}_m{mtb}", "diffuse_sorted",
                     sec(32, window=wdw, mtblock=mtb)))
    # big-tile check upward (r3 swept only downward from 768)
    for tile in (1536, 3072):
        plan.append((f"diffuse_t{tile}", "diffuse_sorted", sec(32, tile=tile)))

    for name, wname, fn in plan:
        o, d, a, _ = workloads[wname]
        tmin, tmed = time_variant(fn, (o, d, a), args.reps)
        print(f"{name:20s} best {tmin*1e3:8.2f} ms  med {tmed*1e3:8.2f} ms  "
              f"{n/tmin/1e6:8.1f} Mrays/s", flush=True)

    # parity: prepass depth must not change hits (same t, same winning row);
    # misses carry t=inf, so compare where BOTH are finite plus the miss set
    o, d, a, _ = workloads["diffuse_sorted"]
    raws = {p: sec_raw(p)(o, d, a)[0] for p in (0, 32, 64)}
    for pa, pb in ((0, 32), (32, 64)):
        ta, tb = np.asarray(raws[pa][0]), np.asarray(raws[pb][0])
        fin = np.isfinite(ta) & np.isfinite(tb)
        print(f"parity pre{pa} vs pre{pb}: "
              f"miss-match {(np.isfinite(ta) == np.isfinite(tb)).mean():.6f}  "
              f"max|dt| {np.abs(ta[fin]-tb[fin]).max():.2e}  "
              f"row-match {(np.asarray(raws[pa][1])==np.asarray(raws[pb][1]))[fin].mean():.6f}",
              flush=True)


if __name__ == "__main__":
    main()
