"""Round-4b measurement queue: the post-ablation A/Bs, in ONE TPU process.

The round-4 stage ablation (scripts/perf_ablate.py, logged in
docs/ROADMAP.md) re-drew the frame map: traversal+resolve ~1307 ms of the
1614 ms frame (81%), sort machinery ~226 ms, ladder glue ~43 ms, everything
else ~80 ms.  That makes two bench-level A/Bs worth their ~10-min variadic
compiles:

  * cull_zero_nee (new, bit-exact: skip occlusion walks for shadow rays
    whose NEE contribution is exactly zero — the mirror sphere's lanes on
    the bench scene);
  * prefix_sort under the VARIADIC lowering (the r4a queue only measured it
    under "gather", where its 37% win was 37% of gather's own overhead;
    the ablation's 226 ms sort-machinery number makes the variadic A/B
    worth the per-rung compile cost).

Ordering: the no-cull anchor first (its jaxpr matches the r4a "variadic"
row, so the persistent cache makes it near-free and it calibrates relay
drift), then cull-on (the new default), then prefix_sort (the compile
wall: one 24-operand sort instance per ladder rung).

Uses bench.py's /tmp cache so the driver's end-of-round bench run compiles
warm.

Usage:
    timeout 7200 python scripts/perf_queue_r4b.py > /tmp/queue_r4b.log 2>&1
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
        # r3/r4a behavior (drift anchor; cull defaults False since d674aa0)
        ("variadic-nocull", {"cull_zero_nee": False}),
        # the defaults as shipped
        ("variadic", {}),
        # exact-zero NEE culling forced on (measure on delta-heavy scenes)
        ("variadic+cull", {"cull_zero_nee": True}),
        # prefix-width bounce sorts under the variadic lowering
        ("variadic+prefix", {"prefix_sort": True}),
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
