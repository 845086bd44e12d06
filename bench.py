"""Benchmark harness: Mrays/s at 1080p 1 spp on the Cornell-box-with-mesh scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline metric: rays actually traced per second (primary + per-bounce path and
shadow rays actually processed by the traversal, i.e. the standard Mrays/s of
the ray-tracing literature), measured over full progressive frames at 1080p,
1 spp/frame, 8 bounces.  ``hud_mrays_per_s`` additionally reports the
reference's HUD definition — W*H/frame_time, which counts only the primary
dispatch size (reference: renderer/Renderer.mm:631-637).
Baseline: BASELINE.md north star = 100 Mrays/s/chip on v5e.
"""

from __future__ import annotations

import argparse
import json
import time

import os

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_pt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
if os.environ.get("JAX_PLATFORMS"):
    # the site hook's eagerly-registered TPU plugin overrides the env var;
    # the config API wins (JAX_PLATFORMS=cpu = CPU smoke runs of the bench)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402

from tpu_pathtracer.config import RenderConfig  # noqa: E402
from tpu_pathtracer.renderer import Renderer  # noqa: E402

BASELINE_MRAYS = 100.0


def _device_watchdog(spp: int, timeout_s: float = 900.0) -> None:
    """Fail loudly if backend init hangs (an unreachable TPU relay blocks
    ``jax.devices()`` forever — a bounded error JSON beats an infinite hang
    for whoever is collecting the bench line).

    900 s, not 300: a HEALTHY relay was measured taking 204 s from
    enumeration to the first scalar execute (Aug 19 r4 session — program
    load / worker handshake, not a wedge), so 300 s misclassifies slow
    inits as failures.  The watchdog exists to catch infinite hangs only.
    """
    import os
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(timeout_s):
            print(json.dumps({
                "metric": f"traced_mrays_per_sec_per_chip_1080p_{spp}spp",
                "value": 0.0,
                "unit": "Mrays/s",
                "vs_baseline": 0.0,
                "error": f"device init exceeded {timeout_s:.0f}s "
                         "(TPU relay unreachable?)",
            }), flush=True)
            os._exit(3)

    threading.Thread(target=watch, daemon=True).start()
    try:
        jax.devices()  # blocks here, not mid-benchmark, if the relay is wedged
        # Enumeration alone is not health: a crashed relay worker still lists
        # its device and then fails the first execute/transfer with
        # FAILED_PRECONDITION (observed after a client was killed mid-compile).
        # Round-trip one scalar so that failure mode also lands in the bounded
        # error JSON instead of an unhandled traceback mid-benchmark.
        import jax.numpy as jnp
        float(jnp.ones((8, 8)).sum())
    except Exception as e:  # noqa: BLE001 — any backend error is "relay down"
        print(json.dumps({
            "metric": f"traced_mrays_per_sec_per_chip_1080p_{spp}spp",
            "value": 0.0,
            "unit": "Mrays/s",
            "vs_baseline": 0.0,
            "error": f"device probe failed: {type(e).__name__}: {e}",
        }), flush=True)
        os._exit(3)
    done.set()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="CornellBox-Water-plastic",
                    help="bench scene (default: the Cornell-box-with-mesh)")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--intersector", default="bvh")
    ap.add_argument("--spp", type=int, default=1,
                    help="samples per frame (fused into one wavefront; >1 "
                         "raises traced Mrays/s via wavefront density — see "
                         "docs/ROADMAP.md — but the headline config is 1)")
    ap.add_argument("--bake-materials", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="override cfg.bake_materials either way (A/B the "
                         "baked-row material resolve; --no-bake-materials "
                         "forces the select-chain path)")
    ap.add_argument("--row-tiles", type=int, default=1,
                    help="sequential row tiles per frame (cfg.row_tiles); "
                         "composes with --spp fusion to push wavefront "
                         "density past the single-wavefront HBM wall, e.g. "
                         "--spp 4 --row-tiles 2 at 1080p")
    ap.add_argument("--fuse", type=int, default=None,
                    help="override cfg.fuse_samples (max samples fused into "
                         "one wavefront)")
    ap.add_argument("--resolve-gather", choices=("rows", "cols", "percol"),
                    default=None,
                    help="override cfg.resolve_gather (payload-resolve "
                         "gather lowering; A/B after scripts/"
                         "perf_gather_probe.py names a winner)")
    ap.add_argument("--prefix-sort", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="A/B cfg.prefix_sort (bounce sorts at the live "
                         "ladder's rung width instead of full width)")
    ap.add_argument("--sort-lowering", choices=("variadic", "gather"),
                    default=None,
                    help="A/B cfg.sort_lowering (variadic lax.sort vs "
                         "argsort+gather; the latter compiles ~100x faster)")
    ap.add_argument("--sort-skip", default=None, metavar="B1,B2",
                    help="A/B cfg.sort_bounce_skip (bounce indices whose "
                         "wavefront sort is skipped, e.g. '1,6,7')")
    ap.add_argument("--cull-zero-nee", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="A/B cfg.cull_zero_nee (skip occlusion walks for "
                         "shadow rays with exactly-zero NEE contribution)")
    ap.add_argument("--fuse-shadow", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="A/B cfg.fuse_shadow_walk (one 2N-lane walk per "
                         "bounce serving the path nearest-hit AND the NEE "
                         "occlusion query)")
    ap.add_argument("--kernel", choices=("window", "minwalk", "sweep"),
                    default=None,
                    help="override cfg.traversal_kernel (sweep = the "
                         "navigation-free dense march for secondary bounces)")
    ap.add_argument("--utilization", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="emit the kernel-measured walk-utilization block "
                         "(spent/useful lane-ops per ray, VPU-peak estimate; "
                         "costs one extra counting-kernel compile)")
    ap.add_argument("--mesh", default=None, metavar="TILESxSPP",
                    help="multi-chip aggregate bench: shard the frame over a "
                         "('tiles','spp') device mesh (e.g. 4x2) and report "
                         "aggregate Mrays/s.  Needs that many devices — on a "
                         "single-chip host set JAX_PLATFORMS=cpu and "
                         "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                         "to measure the scaling SHAPE on a virtual mesh")
    ap.add_argument("--progressive", action="store_true",
                    help="also measure BASELINE.json's secondary metric — "
                         "progressive spp/sec on the cornellbox scene at the "
                         "same resolution (costs one extra compile; opt-in "
                         "so the driver's headline run stays bounded)")
    args = ap.parse_args()
    _device_watchdog(args.spp)

    over = {}
    if args.bake_materials is not None:
        over["bake_materials"] = args.bake_materials
    if args.prefix_sort is not None:
        over["prefix_sort"] = args.prefix_sort
    if args.resolve_gather is not None:
        over["resolve_gather"] = args.resolve_gather
    if args.sort_lowering is not None:
        over["sort_lowering"] = args.sort_lowering
    if args.sort_skip is not None:
        over["sort_bounce_skip"] = args.sort_skip
    if args.cull_zero_nee is not None:
        over["cull_zero_nee"] = args.cull_zero_nee
    if args.fuse_shadow is not None:
        over["fuse_shadow_walk"] = args.fuse_shadow
    if args.kernel is not None:
        over["traversal_kernel"] = args.kernel
    if args.fuse is not None:
        over["fuse_samples"] = args.fuse
    cfg = RenderConfig(
        samples_per_frame=args.spp, max_path_length=args.depth,
        intersector=args.intersector, row_tiles=args.row_tiles, **over,
    )
    mesh = None
    if args.mesh:
        from tpu_pathtracer.parallel.tiles import make_mesh

        n_tiles, n_spp = (int(x) for x in args.mesh.lower().split("x"))
        mesh = make_mesh(n_tiles, n_spp)
    r = Renderer(args.scene, width=args.width, height=args.height, cfg=cfg,
                 mesh=mesh)

    for _ in range(args.warmup):
        r.step()
    r.sync()

    # Individually-synced frame times: the axon relay's throughput drifts by
    # tens of percent hour-to-hour and stalls transiently, so a multi-frame
    # mean is a bad estimator.  The MEDIAN of per-frame times is the headline
    # denominator; best is the stall-free floor; all samples print for audit.
    times = []
    for _ in range(args.frames):
        t0 = time.perf_counter()
        r.step()
        r.sync()
        times.append(time.perf_counter() - t0)
    frame_time = float(np.median(times))
    best = min(times)

    pixels = args.width * args.height
    hud_mrays = pixels / frame_time / 1e6

    # honest per-bounce ray count: EXACT in-pipeline counters over the very
    # frame indices measured above (no probe scaling)
    from tpu_pathtracer.render.stats import count_traced_rays_exact

    measured = tuple(range(args.warmup, args.warmup + args.frames))
    t_tr = time.perf_counter()
    traced = count_traced_rays_exact(
        r.scene, cfg, args.height, args.width,
        frame_indices=measured, intersect=r._intersect, seed=0,
    )
    traced_count_s = time.perf_counter() - t_tr
    honest_mrays = traced / frame_time / 1e6

    img = r.image()
    metric = (f"traced_mrays_per_sec_aggregate_{args.mesh}mesh_{args.spp}spp"
              if mesh is not None
              else f"traced_mrays_per_sec_per_chip_1080p_{args.spp}spp")
    result = {
        "metric": metric,
        "value": round(honest_mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(honest_mrays / BASELINE_MRAYS, 4),
        "hud_mrays_per_s": round(hud_mrays, 3),
        "rays_traced_per_frame": int(traced),
        "ms_per_frame": round(frame_time * 1e3, 3),
        "mean_ms_per_frame": round(float(np.mean(times)) * 1e3, 3),
        "best_ms_per_frame": round(best * 1e3, 3),
        "best_mrays_per_s": round(traced / best / 1e6, 3),
        "frame_times_ms": [round(t * 1e3, 1) for t in times],
        "spp_per_sec": round(args.spp / frame_time, 4),
        "scene": args.scene,
        "resolution": f"{args.width}x{args.height}",
        "path_depth": args.depth,
        "device": str(jax.devices()[0]),
        "mesh": args.mesh,
        "finite": bool(np.isfinite(img).all()),
        "image_mean": round(float(img.mean()), 5),
    }

    # kernel-measured walk-utilization telemetry (VERDICT r4 #5): the
    # structural gap to the north star is lane-op waste, so the bench emits
    # it machine-checkably instead of leaving it in ROADMAP prose.
    if (args.utilization and mesh is None and r.layout is not None
            and jax.default_backend() not in ("cpu", "gpu", "cuda", "rocm")
            and cfg.use_pallas):
        try:
            from tpu_pathtracer.render.stats import utilization_report

            t_ut = time.perf_counter()
            result["utilization"] = utilization_report(
                r.scene, cfg, r.layout, args.height, args.width,
                r._intersect, traced, frame_time,
            )
            result["utilization"]["collect_s"] = round(
                time.perf_counter() - t_ut, 1)
        except Exception as e:  # noqa: BLE001 — telemetry must not kill the bench
            result["utilization"] = {
                "error": f"{type(e).__name__}: {e}"
            }
    result["traced_count_s"] = round(traced_count_s, 1)

    if args.progressive:
        rc = Renderer("cornellbox", width=args.width, height=args.height,
                      cfg=cfg)
        for _ in range(args.warmup):
            rc.step()
        rc.sync()
        ct = []
        for _ in range(args.frames):
            t0 = time.perf_counter()
            rc.step()
            rc.sync()
            ct.append(time.perf_counter() - t0)
        result["cornellbox_spp_per_sec"] = round(
            args.spp / float(np.median(ct)), 4)
        result["cornellbox_ms_per_frame"] = round(
            float(np.median(ct)) * 1e3, 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
