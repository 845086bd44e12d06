"""Benchmark harness: Mrays/s at 1080p 1 spp (reference HUD definition).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Metric semantics follow the reference HUD: Mrays/s = W*H / frame_time — the
primary dispatch size per frame, not per-bounce rays
(reference: renderer/Renderer.mm:631-637).  ``honest_mrays_per_s`` additionally
counts every actually-traced ray (primary + per-bounce path and shadow rays).
Baseline: BASELINE.md north star = 100 Mrays/s/chip at 1080p 1 spp on v5e.
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import numpy as np

from tpu_pathtracer.config import RenderConfig
from tpu_pathtracer.render import init_state, render_frame_jit
from tpu_pathtracer.render.stats import count_traced_rays
from tpu_pathtracer.scene import load_scene, scene_path

BASELINE_MRAYS = 100.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornellbox")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--depth", type=int, default=8)
    args = ap.parse_args()

    scene = load_scene(scene_path(args.scene))
    cfg = RenderConfig(samples_per_frame=1, max_path_length=args.depth)
    state = init_state(args.height, args.width)

    # warmup (compile + cache)
    for _ in range(args.warmup):
        state = render_frame_jit(state, scene, cfg)
    state.accum.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(args.frames):
        state = render_frame_jit(state, scene, cfg)
    state.accum.block_until_ready()
    dt = time.perf_counter() - t0

    frame_time = dt / args.frames
    pixels = args.width * args.height
    hud_mrays = pixels / frame_time / 1e6

    # honest per-bounce ray count from a probe frame
    traced = count_traced_rays(scene, cfg, args.height, args.width)
    honest_mrays = traced / frame_time / 1e6

    img = np.asarray(state.accum)
    result = {
        "metric": "mrays_per_sec_per_chip_1080p_1spp",
        "value": round(hud_mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(hud_mrays / BASELINE_MRAYS, 4),
        "honest_mrays_per_s": round(honest_mrays, 3),
        "rays_traced_per_frame": int(traced),
        "ms_per_frame": round(frame_time * 1e3, 3),
        "spp_per_sec": round(1.0 / frame_time, 4),
        "scene": args.scene,
        "resolution": f"{args.width}x{args.height}",
        "path_depth": args.depth,
        "device": str(jax.devices()[0]),
        "finite": bool(np.isfinite(img).all()),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
