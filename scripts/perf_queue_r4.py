"""Round-4 measurement queue: the shelf-ware A/Bs, in ONE TPU process.

VERDICT r3 item 1: bake_materials, prefix_sort, sort_lowering=gather,
resolve_gather variants and the spp4 density point were all built and
CPU-verified in round 3 but never measured on TPU (relay outage).  The
axon relay's throughput drifts hour-to-hour, so cross-process numbers
don't compare — this script runs every variant in one process,
back-to-back, with the compile cache on, and prints a machine-readable
table at the end.

Ordering matters: every variant that can use sort_lowering="gather"
compiles in seconds; the stock variadic bounce sort is the ~8-min compile
wall (docs/ROADMAP.md), so the variadic baseline runs LAST — if the relay
dies mid-queue the cheap half of the table is already printed.

Usage (background it — ~30-60 min end to end):
    timeout 5400 python scripts/perf_queue_r4.py > /tmp/queue_r4.log 2>&1
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402

from tpu_pathtracer.config import RenderConfig  # noqa: E402
from tpu_pathtracer.renderer import Renderer  # noqa: E402


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
    ap.add_argument("--scene", default="CornellBox-Water-plastic")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset to run (default: all)")
    args = ap.parse_args()

    # device watchdog: fail loudly, not hang (same rationale as bench.py)
    print(f"devices: {jax.devices()}", flush=True)
    import jax.numpy as jnp
    float(jnp.ones((8, 8)).sum())
    print("device execute OK", flush=True)

    G = {"sort_lowering": "gather"}
    queue = [
        # --- cheap-compile half (argsort+gather bounce sort) ---
        ("gather", {**G}),
        ("gather+bake", {**G, "bake_materials": True}),
        ("gather+prefix", {**G, "prefix_sort": True}),
        ("gather+bake+prefix", {**G, "bake_materials": True,
                                "prefix_sort": True}),
        ("gather+rg-cols", {**G, "resolve_gather": "cols"}),
        ("gather+rg-percol", {**G, "resolve_gather": "percol"}),
        # density points past the single-wavefront HBM wall
        ("gather+spp2", {**G, "samples_per_frame": 2}),
        ("gather+spp4-rt2", {**G, "samples_per_frame": 4, "fuse_samples": 4,
                             "row_tiles": 2}),
        # --- the compile wall, last ---
        ("variadic", {}),
        ("variadic+bake", {"bake_materials": True}),
    ]
    if args.variants:
        want = set(args.variants.split(","))
        queue = [q for q in queue if q[0] in want]

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
