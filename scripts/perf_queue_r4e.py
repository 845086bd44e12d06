"""Round-4e queue: the density ladder past 4 spp, plus winner combos.

The measured density curve so far (v5e, 1080p, depth 8, Water-plastic):

    1 spp                 1593 ms   7.47 Mrays/s   0.63 spp/s
    2 spp fused           2921 ms   8.14            0.68
    4 spp fuse4 rt2       5450 ms   8.73            0.73

Each fused-density doubling shrinks the spatial extent a sorted ray-tile
spans, shrinking the BVH tile unions the traversal pays for (isolated walk:
9.8 Mrays/s at 1x, 14.0 at 2x, 17.4 at 4x — r3/r4c sweeps).  row_tiles
bounds HBM: fuse8+rt4 keeps the same 4.15M-lane wavefronts as fuse4+rt2 but
at 8x area density (quarter-frame tiles).  The ladder tops out where linear
per-lane stages (sort, shade, resolve — they scale with total lanes) bury
the per-ray walk win; this queue finds that point.

Also queued: the best sort_bounce_skip schedule (from the r4d queue) on top
of the best density point, if r4d showed a win.

Usage:
    timeout 7000 python scripts/perf_queue_r4e.py > /tmp/queue_r4e.log 2>&1
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_pt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from perf_queue_r4 import measure  # noqa: E402

# perf_queue_r4's module body re-points the cache at tests/.jax_cache;
# point it back at the BENCH cache so the driver's end-of-round bench.py
# run compiles warm from whatever this queue compiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_pt_jax_cache")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="CornellBox-Water-plastic")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--variants", default=None)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    import jax.numpy as jnp
    float(jnp.ones((8, 8)).sum())
    print("device execute OK", flush=True)

    queue = [
        # cross-process anchor (cached compile)
        ("spp4-fuse4-rt2", {"samples_per_frame": 4, "fuse_samples": 4,
                            "row_tiles": 2}),
        # 8x area density, same 4.15M-lane wavefront size as fuse4+rt2
        ("spp8-fuse8-rt4", {"samples_per_frame": 8, "fuse_samples": 8,
                            "row_tiles": 4}),
        # 16x density, 135-row tiles (1080 % 8 == 0), still 4.15M lanes
        ("spp16-fuse16-rt8", {"samples_per_frame": 16, "fuse_samples": 16,
                              "row_tiles": 8}),
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
