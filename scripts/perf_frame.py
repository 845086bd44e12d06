"""Decompose full-frame cost at 1080p by sweeping depth and feature knobs.

Each configuration is one jitted render_frame; timing syncs on the scalar
frame_index (4-byte pull, avoiding the ~300 MB/s relay transfer artifact).
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

import numpy as np  # noqa: E402

from tpu_pathtracer.config import RenderConfig  # noqa: E402
from tpu_pathtracer.renderer import Renderer  # noqa: E402

W, H = 1920, 1080


def time_frames(r, reps=3):
    r.step()  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r.step()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="CornellBox-Water-plastic")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    base = RenderConfig(samples_per_frame=1)
    cfgs = {
        "depth1": base.replace(max_path_length=1),
        "depth2": base.replace(max_path_length=2),
        "depth4": base.replace(max_path_length=4),
        "depth8": base.replace(max_path_length=8),
        "depth8_nosort": base.replace(max_path_length=8, sort_rays=False),
    }
    for name, cfg in cfgs.items():
        t0 = time.perf_counter()
        r = Renderer(args.scene, width=W, height=H, cfg=cfg)
        t = time_frames(r, args.reps)
        print(
            f"{name:22s} frame {t*1e3:8.1f} ms   (setup+compile "
            f"{time.perf_counter()-t0-t*args.reps:6.1f} s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
