"""Scaling table: frame time across scenes/resolutions with current defaults."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from tpu_pathtracer.config import RenderConfig  # noqa: E402
from tpu_pathtracer.renderer import Renderer  # noqa: E402

CONFIGS = [
    ("cornellbox", 256, 256, 3),
    ("cornellbox", 800, 600, 8),
    ("CornellBox-Water-plastic", 512, 512, 8),
    ("CornellBox-Water-plastic", 960, 540, 8),
    ("CornellBox-Water-plastic", 1280, 720, 8),
    ("CornellBox-Water-plastic", 1920, 1080, 8),
]


def main():
    for scene, w, h, depth in CONFIGS:
        cfg = RenderConfig(samples_per_frame=1, max_path_length=depth,
                           frames_in_flight=1)
        r = Renderer(scene, width=w, height=h, cfg=cfg)
        r.step()  # compile
        r.sync()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            r.step()
            r.sync()
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"{scene:26s} {w:5d}x{h:<5d} depth {depth}: "
              f"{t*1e3:8.1f} ms/frame  {1.0/t:6.2f} spp/s", flush=True)


if __name__ == "__main__":
    main()
