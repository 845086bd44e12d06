"""Round-4d measurement queue: sort_bounce_skip + the variadic density point.

Two armed-but-unmeasured items from docs/ROADMAP.md, in ONE TPU process
(relay drift makes cross-process numbers incomparable; the variadic anchor
re-run calibrates):

  * sort_bounce_skip — the r4 ablation priced sort machinery at ~226 ms/frame
    (~28 ms/bounce); skipping a bounce's sort is EXACT (a bounce only kills
    lanes, so live lanes stay inside the last sorted prefix) but trades a
    staler tile order for that bounce's walks.  Candidate schedules: "1"
    (primary hits are screen-coherent already) and "1,6,7" (late bounces'
    live sets change slowly).  Each schedule is a fresh variadic compile, so
    only two are queued.
  * spp4 + fuse4 + row_tiles2 under VARIADIC — the r4a queue only measured
    this density point under the "gather" lowering, where sort-gather
    overhead buried it (ROADMAP r4a table).  The fused spp2 variadic point
    (8.14 Mrays/s, +14%/ray) and the isolated walk's density curve
    (+34%/ray at 2x, r4c) predict a real win at 4x density; this is the
    end-to-end check.  Lane count per wavefront equals the spp2-fused case
    (two 4.15M-lane half-frame wavefronts), so the variadic sort compile is
    known feasible.

Ordering: cache-warm anchors first (variadic, spp2-fused), then the density
point (the big lever), then the skip schedules — if the relay dies
mid-queue, the most valuable rows are already printed.

Usage (background it — ~40-60 min end to end, dominated by 3 fresh
variadic compiles):
    timeout 5400 python scripts/perf_queue_r4d.py > /tmp/queue_r4d.log 2>&1
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
    ap.add_argument("--frames", type=int, default=6)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--variants", default=None)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    import jax.numpy as jnp
    float(jnp.ones((8, 8)).sum())
    print("device execute OK", flush=True)

    queue = [
        # drift anchor — jaxpr matches the r4a/r4b "variadic" row (cached)
        ("variadic", {}),
        # fused spp2 anchor (r3: 2921 ms, 8.14 Mrays/s)
        ("spp2-fused", {"samples_per_frame": 2}),
        # the 4x-density point under variadic (r4a only had it under gather)
        ("spp4-fuse4-rt2", {"samples_per_frame": 4, "fuse_samples": 4,
                            "row_tiles": 2}),
        # sort-skip schedules (each a fresh variadic compile)
        ("skip1", {"sort_bounce_skip": "1"}),
        ("skip167", {"sort_bounce_skip": "1,6,7"}),
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
