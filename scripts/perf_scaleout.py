"""Tiles-axis scale-out shape, measured honestly on ONE real chip.

VERDICT r3 item 4 asks for a documented aggregate-scaling number.  A virtual
CPU mesh cannot provide one — its "devices" timeshare the same host cores, so
wall-clock never scales and the measurement would be noise dressed as data.
What CAN be measured honestly with one real chip: the per-chip cost of the
row-shard each member of an N-chip ('tiles', 1) mesh owns.  The tiles axis
has NO collective in the render step (parallel/tiles.py — each chip owns its
rows; communication happens only at display/save gather), so

    aggregate_mrays(N) ~= N * rays(shard_N) / time(shard_N)

up to ICI idle time, which is zero here by construction.  The interesting
physics is the SUB-linearity: a 1/N-height wavefront has 1/N the lanes, so
sorted tiles span more of the scene and the per-ray walk cost RISES (the
union-inflation effect the fusion table shows in reverse).  This script
measures time(shard_N) for N in {1, 2, 4, 8} at 1080p via the row-tile
entry points render_sample already exposes (row0/full_height — the same code
path parallel/tiles.py shards), and prints the implied aggregate curve.

Usage: timeout 3600 python scripts/perf_scaleout.py > /tmp/scaleout.log 2>&1
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

import jax.numpy as jnp  # noqa: E402

from tpu_pathtracer.config import RenderConfig  # noqa: E402
from tpu_pathtracer.models.camera import Camera  # noqa: E402
from tpu_pathtracer.render.wavefront import render_sample  # noqa: E402
from tpu_pathtracer.renderer import make_intersector  # noqa: E402
from tpu_pathtracer.scene import load_scene, scene_path  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="CornellBox-Water-plastic")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--shards", default="1,2,4,8")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    float(jnp.ones((4,)).sum())

    scene = load_scene(scene_path(args.scene))
    cfg = RenderConfig(max_path_length=args.depth)
    intersect = make_intersector(scene, cfg)
    cam = Camera.reference_default()
    key = jax.random.PRNGKey(0)

    rows = []
    for n in (int(x) for x in args.shards.split(",")):
        if args.height % n:
            print(f"skip N={n}: height {args.height} not divisible", flush=True)
            continue
        h = args.height // n
        # shard 0's rows; every shard is statistically identical work
        fn = jax.jit(lambda k, f, _h=h: render_sample(
            scene, cfg, cam, _h, args.width, k, f, intersect=intersect,
            row0=0, full_height=args.height, full_width=args.width,
            with_ray_count=True))
        out, nrays = fn(key, jnp.int32(0))
        float(jnp.sum(out))  # sync via on-device reduce (relay D2H is slow)
        ts = []
        traced = 0.0
        for i in range(args.reps):
            t0 = time.perf_counter()
            out, nrays = fn(key, jnp.int32(i + 1))
            float(jnp.sum(out))
            ts.append(time.perf_counter() - t0)
            traced = float(nrays)  # frame-dependent; use the last rep's
        best = min(ts)
        row = {
            "n_chips": n, "shard_rows": h,
            "ms_per_shard_frame": round(best * 1e3, 1),
            "traced_rays_shard": traced,
            "aggregate_mrays": round(n * traced / best / 1e6, 2),
        }
        rows.append(row)
        print("ROW " + json.dumps(row), flush=True)

    if rows and rows[0].get("aggregate_mrays"):
        base = rows[0]["aggregate_mrays"]
        print("\nN  aggregate Mrays/s  efficiency vs 1 chip")
        for r in rows:
            eff = r["aggregate_mrays"] / (base * r["n_chips"])
            print(f"{r['n_chips']}  {r['aggregate_mrays']:10.2f}  {eff:6.2%}")


if __name__ == "__main__":
    main()
