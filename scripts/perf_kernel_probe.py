"""Round-5 kernel probe: window vs dense-sweep vs fused 2N-lane walks on the
PRODUCTION bounce-1 secondary wavefront (path rays + their NEE shadow pack,
sorted exactly as render_sample sorts them — stats.first_secondary_wavefront).

Why (docs/ROADMAP.md round-4 ablation): traversal+resolve is 81% of the
frame and the window walk's leaf stage runs at ~4% lane utilization — a
sorted 768-lane diffuse tile demands 100-150 of the scene's ~127 leaves, so
the walk already sweeps nearly the whole triangle table while paying box
tests + chain logic to decide to.  Candidates this probe prices, isolated
(raw kernel out, on-device scalar-reduce sync, min of reps — the r4c
methodology):

  * win-path / occl-v1   — the production pair (anchor): secondary window
                           walk + separate v1 occlusion walk.
  * fused-win            — ONE 2N-lane window walk serving both queries
                           (cfg.fuse_shadow_walk); the tile union is paid
                           once for path+shadow lanes departing the same
                           hit points (measured density curve: +34%/ray
                           at 2x lane density).
  * sweep tXXX bYY       — the navigation-free dense march
                           (cfg.traversal_kernel="sweep") at tile x mtblock;
                           cost is exactly lanes x T8 rows, but every op is
                           a full-width regular block op.
  * sweep-shadow         — the sweep on the range-capped shadow query (the
                           cap only prunes via best_t, not via row count,
                           so this should LOSE to occl-v1 — priced to pin).

Speed-of-light yardstick printed per variant: rows_tested x lanes x
14 ops(bw) / VPU peak (3.85e12 lane-ops/s on v5e).

Usage:
    timeout 3600 python scripts/perf_kernel_probe.py > /tmp/probe_r5.log 2>&1
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_pt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu_pathtracer.accel import build_layout  # noqa: E402
from tpu_pathtracer.config import RenderConfig  # noqa: E402
from tpu_pathtracer.ops import pallas_traverse as pt  # noqa: E402
from tpu_pathtracer.render.stats import (  # noqa: E402
    VPU_PEAK_LANE_OPS,
    first_secondary_wavefront,
)
from tpu_pathtracer.render.wavefront import make_intersector  # noqa: E402
from tpu_pathtracer.scene import load_scene, scene_path  # noqa: E402


def timed(fn, reps):
    """Compile + time fn() (returns a device array tuple/pytree); sync via a
    tiny strided on-device reduce (ROADMAP measurement trap: never D2H the
    (8, N) raw output through the relay)."""
    sync = jax.jit(lambda: jnp.sum(jax.tree_util.tree_leaves(fn())[0][..., ::4097]))
    t0 = time.perf_counter()
    float(sync())
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(sync())
        ts.append(time.perf_counter() - t0)
    return min(ts), compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="CornellBox-Water-plastic")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sweep-tiles", default="1536,3072,6144")
    ap.add_argument("--sweep-blocks", default="56,112")
    ap.add_argument("--variants", default=None,
                    help="comma filter on printed variant names (substring)")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    float(jnp.ones((8, 8)).sum())
    print("device execute OK", flush=True)

    scene = load_scene(scene_path(args.scene))
    cfg = RenderConfig()
    lay = build_layout(scene, leaf_size=cfg.leaf_size)
    lay_occl = build_layout(scene, leaf_size=cfg.occlusion_leaf_size)
    isect = make_intersector(scene, cfg, lay, lay_occl)

    print("building production bounce-1 wavefront...", flush=True)
    st, pk = first_secondary_wavefront(
        scene, cfg, args.height, args.width, intersect=isect)
    st, pk = jax.block_until_ready((st, pk))
    n = int(st.origin.shape[1])
    live_p = float(jnp.sum(st.alive))
    live_s = float(jnp.sum(pk.ok))
    print(f"lanes={n} live_path={live_p:.0f} live_shadow={live_s:.0f}",
          flush=True)

    t8 = int(lay.tris8bw.shape[0])
    ops_row = 14.0  # bw

    def sol_ms(lanes, rows):
        return 1e3 * lanes * rows * ops_row / VPU_PEAK_LANE_OPS

    variants = []

    # --- anchors: the production separate pair ---
    variants.append((
        "win-path t768w8b16", n,
        lambda: pt.intersect_bvh_window(
            st.origin, st.direction, lay, active=st.alive,
            tile=cfg.secondary_tile, prepass=cfg.traversal_prepass,
            chain=cfg.secondary_chain, window=cfg.secondary_window,
            mtblock=cfg.secondary_mtblock, tritest=cfg.tritest, raw=True),
        None,
    ))
    variants.append((
        "occl-v1 t6144 leaf8", n,
        lambda: pt.intersect_bvh_pallas(
            st.origin, pk.to_light, lay_occl, active=pk.ok, t_max=pk.cap,
            resolve=False, prepass=0, tile=cfg.occlusion_tile).t,
        None,
    ))

    # --- fused 2N window walk ---
    def fused_win():
        raw, _ = pt.intersect_bvh_window(
            pt._block_interleave(st.origin, st.origin, 384),
            pt._block_interleave(st.direction, pk.to_light, 384),
            lay,
            active=pt._block_interleave(
                st.alive.astype(jnp.float32), pk.ok.astype(jnp.float32), 384),
            t_max=pt._block_interleave(
                jnp.full((n,), jnp.inf, jnp.float32),
                jnp.broadcast_to(pk.cap, (n,)).astype(jnp.float32), 384),
            tile=cfg.secondary_tile, prepass=cfg.traversal_prepass,
            chain=cfg.secondary_chain, window=cfg.secondary_window,
            mtblock=cfg.secondary_mtblock, tritest=cfg.tritest, raw=True,
            with_orig=True)
        return raw

    variants.append(("fused-win 2N t768", 2 * n, fused_win, None))

    # --- dense sweeps on the path query ---
    for tile in [int(x) for x in args.sweep_tiles.split(",")]:
        for mb in [int(x) for x in args.sweep_blocks.split(",")]:
            nblocks = -(-(lay.num_tris + 1) // mb)
            rows = nblocks * mb
            variants.append((
                f"sweep-path t{tile} b{mb}", n,
                (lambda tile=tile, mb=mb: pt.intersect_bvh_sweep(
                    st.origin, st.direction, lay, active=st.alive,
                    tile=tile, mtblock=mb, tritest=cfg.tritest, raw=True)),
                rows,
            ))

    # --- sweep on the range-capped shadow query (expected to lose) ---
    variants.append((
        "sweep-shadow t6144 b56", n,
        lambda: pt.intersect_bvh_sweep(
            st.origin, pk.to_light, lay, active=pk.ok, t_max=pk.cap,
            tile=6144, mtblock=56, tritest=cfg.tritest, raw=True),
        -(-(lay.num_tris + 1) // 56) * 56,
    ))

    # --- fused 2N sweep (no unions to share: expected ~2x sweep-path) ---
    def fused_sweep():
        raw, _ = pt.intersect_bvh_sweep(
            pt._block_interleave(st.origin, st.origin, 384),
            pt._block_interleave(st.direction, pk.to_light, 384),
            lay,
            active=pt._block_interleave(
                st.alive.astype(jnp.float32), pk.ok.astype(jnp.float32), 384),
            t_max=pt._block_interleave(
                jnp.full((n,), jnp.inf, jnp.float32),
                jnp.broadcast_to(pk.cap, (n,)).astype(jnp.float32), 384),
            tile=6144, mtblock=56, tritest=cfg.tritest, raw=True,
            with_orig=True)
        return raw

    variants.append((
        "fused-sweep 2N t6144 b56", 2 * n, fused_sweep,
        -(-(lay.num_tris + 1) // 56) * 56,
    ))

    if args.variants:
        keys = args.variants.split(",")
        variants = [v for v in variants if any(k in v[0] for k in keys)]

    rows_out = []
    for name, lanes, fn, rows in variants:
        try:
            ms, compile_s = timed(fn, args.reps)
        except Exception as e:  # noqa: BLE001 — keep the probe draining
            print(f"ROW-FAILED {name}: {type(e).__name__}: {e}", flush=True)
            continue
        ms *= 1e3
        sol = sol_ms(lanes, rows) if rows else float("nan")
        mrays = live_p / (ms / 1e3) / 1e6 if "path" in name else float("nan")
        print(f"ROW {name:26s} {ms:8.1f} ms  sol={sol:6.1f} ms  "
              f"compile={compile_s:5.1f}s", flush=True)
        rows_out.append((name, ms, sol))

    print("\n=== SUMMARY (ms | speed-of-light ms) ===")
    for name, ms, sol in rows_out:
        print(f"{name:28s} {ms:8.1f} {sol:8.1f}")
    by = {name: ms for name, ms, _ in rows_out}
    if "win-path t768w8b16" in by and "occl-v1 t6144 leaf8" in by:
        sep = by["win-path t768w8b16"] + by["occl-v1 t6144 leaf8"]
        print(f"\nseparate pair total: {sep:8.1f} ms")
        for name, ms, _ in rows_out:
            if name.startswith("fused"):
                print(f"  {name}: {ms:8.1f} ms  ({100 * (ms - sep) / sep:+.1f}%)")
        sweeps = [(ms, name) for name, ms, _ in rows_out
                  if name.startswith("sweep-path")]
        if sweeps:
            bms, bname = min(sweeps)
            print(f"  best sweep+occl: {bname}: "
                  f"{bms + by['occl-v1 t6144 leaf8']:8.1f} ms "
                  f"({100 * (bms + by['occl-v1 t6144 leaf8'] - sep) / sep:+.1f}%)")


if __name__ == "__main__":
    main()
