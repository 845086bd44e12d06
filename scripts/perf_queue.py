"""Parameterized full-frame measurement queue (consolidates the r4* scripts).

Runs a PLAN — an ordered list of (variant-name, RenderConfig overrides) —
in ONE TPU process, back-to-back, with the compile cache pinned to the
bench cache.  One process because the axon relay's throughput drifts
hour-to-hour, so cross-process numbers don't compare; each plan opens with
a cached-compile anchor variant to calibrate against prior sessions.

Every historical plan is kept under its round name so any table in
docs/ROADMAP.md can be reproduced verbatim:
    python scripts/perf_queue.py --plan r4d
New measurements go in new named plans (or ad-hoc JSON):
    python scripts/perf_queue.py --plan my_plan.json
where my_plan.json is [["name", {"cfg_field": value, ...}], ...].

Usage (background it; each fresh variadic-sort compile is ~8 min):
    timeout 7200 python scripts/perf_queue.py --plan r5 > /tmp/queue_r5.log 2>&1
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_pt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402

from tpu_pathtracer.config import RenderConfig  # noqa: E402
from tpu_pathtracer.renderer import Renderer  # noqa: E402

G = {"sort_lowering": "gather"}

PLANS = {
    # r4a (Aug 19): the round-3 shelf-ware A/Bs — sort lowering, bake,
    # prefix, resolve-gather variants, gather-regime density points.
    # Results: docs/ROADMAP.md "Round-4 measurement queue".
    "r4": [
        ("gather", {**G}),
        ("gather+bake", {**G, "bake_materials": True}),
        ("gather+prefix", {**G, "prefix_sort": True}),
        ("gather+bake+prefix", {**G, "bake_materials": True,
                                "prefix_sort": True}),
        ("gather+rg-cols", {**G, "resolve_gather": "cols"}),
        ("gather+rg-percol", {**G, "resolve_gather": "percol"}),
        ("gather+spp2", {**G, "samples_per_frame": 2}),
        ("gather+spp4-rt2", {**G, "samples_per_frame": 4, "fuse_samples": 4,
                             "row_tiles": 2}),
        ("variadic", {}),
        ("variadic+bake", {"bake_materials": True}),
    ],
    # r4b (Aug 19): cull_zero_nee + the prefix-under-variadic compile wall.
    # Results: ROADMAP "Round-4b queue".
    "r4b": [
        ("variadic-nocull", {"cull_zero_nee": False}),
        ("variadic+cull", {"cull_zero_nee": True}),
        ("variadic+prefix", {"prefix_sort": True}),  # compile-walled >70 min
    ],
    # r4d (Aug 20): sort_bounce_skip schedules + the variadic density point.
    # Results: ROADMAP "Round-4d queue" (skips LOSE 13-51%).
    "r4d": [
        ("variadic", {}),
        ("spp2-fused", {"samples_per_frame": 2}),
        ("spp4-fuse4-rt2", {"samples_per_frame": 4, "fuse_samples": 4,
                            "row_tiles": 2}),
        ("skip1", {"sort_bounce_skip": "1"}),
        ("skip167", {"sort_bounce_skip": "1,6,7"}),
    ],
    # r4e: the density ladder past 4 spp (wavefront size held at 4.15M).
    "r4e": [
        ("spp4-fuse4-rt2", {"samples_per_frame": 4, "fuse_samples": 4,
                            "row_tiles": 2}),
        ("spp8-fuse8-rt4", {"samples_per_frame": 8, "fuse_samples": 8,
                            "row_tiles": 4}),
        ("spp16-fuse16-rt8", {"samples_per_frame": 16, "fuse_samples": 16,
                              "row_tiles": 8}),
    ],
    # r5: anchor + the density ladder past 4 spp.  The successor-kernel
    # candidates (fuse_shadow_walk, traversal_kernel="sweep") were killed at
    # the KERNEL level by scripts/perf_kernel_probe.py (fused-win +15%,
    # sweep 3x — docs/ROADMAP.md r5 probe table), so no full-frame A/B is
    # queued for them.  The ladder rungs keep the 4.15M-lane wavefront shape
    # of spp4-fuse4-rt2, so their variadic sorts compile warm from its cache.
    "r5": [
        ("variadic", {}),
        ("spp8-fuse8-rt4", {"samples_per_frame": 8, "fuse_samples": 8,
                            "row_tiles": 4}),
        ("spp16-fuse16-rt8", {"samples_per_frame": 16, "fuse_samples": 16,
                              "row_tiles": 8}),
    ],
}


def measure(name, cfg_kwargs, scene, width, height, depth, frames, warmup,
            traced_cache):
    cfg = RenderConfig(max_path_length=depth, **cfg_kwargs)
    t0 = time.perf_counter()
    r = Renderer(scene, width=width, height=height, cfg=cfg)
    for _ in range(warmup):
        r.step()
    r.sync()
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(frames):
        t1 = time.perf_counter()
        r.step()
        r.sync()
        times.append(time.perf_counter() - t1)
    med = float(np.median(times))
    best = float(min(times))

    # exact traced-ray numerator — depends only on the sampling config, so
    # cache it across variants that share (spp, fuse, row_tiles)
    key = (cfg.samples_per_frame, cfg.fuse_samples, cfg.row_tiles,
           getattr(cfg, "cull_zero_nee", True))
    if key not in traced_cache:
        from tpu_pathtracer.render.stats import count_traced_rays_exact

        measured = tuple(range(warmup, warmup + frames))
        traced_cache[key] = count_traced_rays_exact(
            r.scene, cfg, height, width, frame_indices=measured,
            intersect=r._intersect, seed=0)
    traced = traced_cache[key]

    row = {
        "variant": name,
        "ms_median": round(med * 1e3, 1),
        "ms_best": round(best * 1e3, 1),
        "mrays_median": round(traced / med / 1e6, 3),
        "mrays_best": round(traced / best / 1e6, 3),
        "compile_s": round(compile_s, 1),
        "frame_times_ms": [round(t * 1e3, 1) for t in times],
        "cfg": cfg_kwargs,
    }
    print("ROW " + json.dumps(row), flush=True)
    del r
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--plan", default="r5",
                    help="named plan (%s) or a JSON file of "
                         "[[name, overrides], ...]" % ", ".join(PLANS))
    ap.add_argument("--scene", default="CornellBox-Water-plastic")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset to run (default: all)")
    args = ap.parse_args()

    if args.plan in PLANS:
        queue = PLANS[args.plan]
    else:
        with open(args.plan) as f:
            queue = [(name, kw) for name, kw in json.load(f)]
    if args.variants:
        want = set(args.variants.split(","))
        queue = [q for q in queue if q[0] in want]

    # device watchdog: fail loudly, not hang (same rationale as bench.py)
    print(f"devices: {jax.devices()}", flush=True)
    import jax.numpy as jnp
    float(jnp.ones((8, 8)).sum())
    print("device execute OK", flush=True)

    traced_cache = {}
    rows = []
    for name, kw in queue:
        try:
            rows.append(measure(name, kw, args.scene, args.width, args.height,
                                args.depth, args.frames, args.warmup,
                                traced_cache))
        except Exception as e:  # noqa: BLE001 — keep the queue draining
            print(f"ROW-FAILED {name}: {type(e).__name__}: {e}", flush=True)

    print("\n=== SUMMARY (median ms/frame | best | Mrays/s median) ===")
    for row in rows:
        print(f"{row['variant']:22s} {row['ms_median']:8.1f} "
              f"{row['ms_best']:8.1f} {row['mrays_median']:8.3f}")


if __name__ == "__main__":
    main()
