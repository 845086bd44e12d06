"""Per-HLO-op attribution of the real frame via jax.profiler + xprof.

Runs N profiled frame steps, converts the captured xplane with the
tensorboard_plugin_profile "hlo_stats" tool, and prints the top ops by
self time — the ground-truth complement to the ablation estimates in
perf_ablate.py (no monkeypatching, the production frame as-is).
"""
from __future__ import annotations

import argparse
import glob
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

from tpu_pathtracer.config import RenderConfig  # noqa: E402
from tpu_pathtracer.renderer import Renderer  # noqa: E402


def top_ops(trace_dir: str, limit: int, tool: str = "hlo_stats"):
    """Parse the newest xplane.pb under trace_dir -> [(self_us, name), ...]."""
    from xprof.convert import raw_to_tool_data

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    data, _ = raw_to_tool_data.xspace_to_tool_data([paths[-1]], tool, {})
    table = json.loads(data) if isinstance(data, (str, bytes)) else data
    # gviz table: cols give labels, rows the values
    cols = [c["label"] for c in table["cols"]]
    i_name = next(i for i, c in enumerate(cols) if "HLO op name" in c or c == "program_id")
    try:
        i_self = next(i for i, c in enumerate(cols) if "Total self time (us)" in c)
    except StopIteration:
        i_self = next(i for i, c in enumerate(cols) if "self time" in c.lower())
    i_cat = next((i for i, c in enumerate(cols) if "category" in c.lower()), None)
    rows = []
    for r in table["rows"]:
        vals = [c["v"] for c in r["c"]]
        cat = vals[i_cat] if i_cat is not None else ""
        rows.append((float(vals[i_self] or 0), str(vals[i_name]), str(cat)))
    rows.sort(reverse=True)
    return rows[:limit], sum(r[0] for r in rows)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="CornellBox-Water-plastic")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--limit", type=int, default=40)
    ap.add_argument("--trace-dir", default="/tmp/pt_trace")
    ap.add_argument("--parse-only", action="store_true",
                    help="skip rendering; parse an existing trace dir")
    ap.add_argument("--tool", default="hlo_stats",
                    help="xprof tool table (hlo_stats, framework_op_stats)")
    args = ap.parse_args()

    if not args.parse_only:
        cfg = RenderConfig(samples_per_frame=1, frames_in_flight=1)
        r = Renderer(args.scene, width=args.width, height=args.height, cfg=cfg)
        r.step(); r.sync()          # compile outside the trace
        t0 = time.perf_counter()
        r.profile(args.trace_dir, frames=args.frames)
        print(f"traced {args.frames} frames in "
              f"{time.perf_counter()-t0:.1f} s", flush=True)

    rows, total = top_ops(args.trace_dir, args.limit, args.tool)
    print(f"{'self us':>12}  {'% of listed':>10}  category / op")
    for self_us, name, cat in rows:
        print(f"{self_us:12.0f}  {100*self_us/max(total,1e-9):9.2f}%  "
              f"[{cat}] {name[:110]}")
    print(f"total listed: {total/1e3:.1f} ms")


if __name__ == "__main__":
    main()
