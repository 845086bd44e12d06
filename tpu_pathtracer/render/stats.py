"""Render statistics: honest traced-ray accounting.

The reference HUD divides dispatch size by frame time
(reference: renderer/Renderer.mm:631-637), which under-reports work by the
bounce count and over-reports it by the dead-ray fraction.  This module counts
rays the traversal actually processes (path rays alive at each bounce + active
shadow rays), probed at reduced resolution and scaled.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import RenderConfig
from ..models.camera import Camera, generate_rays_flat
from ..render.noise import bounce_uniforms, camera_jitter, pids_from_order
from ..render.order import make_order
from ..render.wavefront import (
    initial_path_state,
    make_brute_intersector,
    trace_bounce,
)
from ..scene.scene import Scene


@partial(jax.jit, static_argnames=("cfg", "height", "width"))
def _probe(scene: Scene, cfg: RenderConfig, height: int, width: int, key):
    frame = jnp.int32(0)
    order = make_order(height, width)
    pids = pids_from_order(order, width)
    jitter = camera_jitter(cfg, key, frame, pids, height, width)
    origins, directions = generate_rays_flat(
        Camera.reference_default(), order.rows, order.cols, jitter, height, width
    )
    state = initial_path_state(origins, directions, cfg.spectrum_samples, pids)
    intersect = make_brute_intersector(scene)
    total = jnp.zeros((), jnp.float32)
    for b in range(cfg.max_path_length):  # unrolled: python loop, static depth
        uniforms = bounce_uniforms(
            cfg, key, frame, b, pids, height, width,
            with_env=scene.env is not None,
        )
        state, stats = trace_bounce(
            scene, cfg, intersect, jnp.int32(b), state, uniforms, with_stats=True
        )
        total = total + stats["path"].astype(jnp.float32) + stats["shadow"].astype(jnp.float32)
    return total


def count_traced_rays(
    scene: Scene, cfg: RenderConfig, height: int, width: int, probe_scale: int = 4
) -> float:
    """Estimated rays traced per frame at (height, width), 1 spp: probes at
    1/probe_scale resolution with the brute intersector and scales by area.
    Prefer :func:`count_traced_rays_exact` for benchmark numerators."""
    ph = max(height // probe_scale, 8)
    pw = max(width // probe_scale, 8)
    probe = float(_probe(scene, cfg, ph, pw, jax.random.PRNGKey(0)))
    scale = (height * width) / (ph * pw)
    return probe * scale * cfg.samples_per_frame


def count_traced_rays_exact(
    scene: Scene,
    cfg: RenderConfig,
    height: int,
    width: int,
    frame_indices=(0,),
    intersect=None,
    camera: Camera | None = None,
    seed: int = 0,
) -> float:
    """EXACT rays traced for the given frame indices, averaged per frame.

    Runs the production pipeline (same RNG key schedule as
    render/state.py:sample_sum) with in-pipeline alive/shadow counters —
    no resolution scaling, no estimator.
    """
    from ..render.state import frame_rng_key, fuse_schedule, fused_wavefront_key
    from ..render.wavefront import render_sample

    camera = camera or Camera.reference_default()

    from ..config import NoiseMode

    # Mirror render_frame's sequential row tiling (render/state.py): the
    # per-lane ray counts are invariant to how lanes are grouped into
    # wavefronts (alive progression is a pure function of the lane's
    # absolute-pixel RNG stream), but the PEAK memory is not — counting an
    # HBM-bounded config (e.g. fuse_samples=4 at 1080p) through one untiled
    # wavefront would OOM the very config row_tiles exists to make fit.
    tiles = max(1, cfg.row_tiles)
    if tiles > 1 and height % tiles:
        tiles = 1
    tile_h = height // tiles

    @partial(jax.jit, static_argnames=())
    def one_frame(key, fi):
        frame_key = frame_rng_key(cfg, key, fi)
        total = jnp.float32(0)
        tile_kw = [
            dict(row0=r * tile_h, full_height=height, full_width=width)
            for r in range(tiles)
        ]
        if cfg.noise_mode == NoiseMode.PRNG:
            # the SAME schedule helpers sample_sum uses (render/state.py)
            fuse, n_chunks, rem = fuse_schedule(cfg, cfg.samples_per_frame)
            wkey = fused_wavefront_key(frame_key)
            chunks = [(fuse, i * fuse) for i in range(n_chunks)]
            if rem:
                chunks.append((rem, n_chunks * fuse))
            for kw in tile_kw:
                for m, s0 in chunks:
                    _, c = render_sample(
                        scene, cfg, camera, tile_h, width, wkey, fi,
                        intersect, with_ray_count=True, samples=m,
                        sample0=s0, **kw,
                    )
                    total = total + c
            return total
        for kw in tile_kw:
            for s in range(cfg.samples_per_frame):
                k = jax.random.fold_in(frame_key, s)
                _, c = render_sample(
                    scene, cfg, camera, tile_h, width, k, fi, intersect,
                    with_ray_count=True, **kw,
                )
                total = total + c
        return total

    key = jax.random.PRNGKey(seed)
    counts = [float(one_frame(key, jnp.int32(f))) for f in frame_indices]
    return sum(counts) / len(counts)


def first_secondary_wavefront(
    scene: Scene,
    cfg: RenderConfig,
    height: int,
    width: int,
    intersect=None,
    camera: Camera | None = None,
    seed: int = 0,
    frame_index: int = 0,
):
    """Reconstruct the frame's FIRST secondary wavefront — the bounce-1 path
    rays plus their deferred NEE shadow pack, sorted exactly as the
    production loop sorts them (render/wavefront.py:render_sample).  This is
    the canonical incoherent workload the traversal tuning targets; the
    utilization telemetry (bench.py) measures its lane-op economics.

    The sort runs under the "gather" lowering — bit-identical lane order to
    the production variadic sort (lax.sort is stable) without its ~8-minute
    TPU compile.
    """
    from ..render.state import frame_rng_key, fused_wavefront_key
    from ..render.wavefront import (
        initial_path_state,
        make_brute_intersector,
        scene_sort_bounds,
        sort_wavefront,
        trace_bounce,
    )

    camera = camera or Camera.reference_default()
    if intersect is None:
        intersect = make_brute_intersector(scene)
    fi = jnp.int32(frame_index)
    wkey = fused_wavefront_key(frame_rng_key(cfg, jax.random.PRNGKey(seed), fi))

    tile = (cfg.traversal_tile
            if cfg.intersector == "bvh" and cfg.use_pallas else None)
    order = make_order(height, width, 0, tile)
    pids = pids_from_order(order, width)
    cam_key = jax.random.fold_in(wkey, 0xC0FFEE)
    jitter = camera_jitter(cfg, cam_key, fi, pids, height, width)
    origins, directions = generate_rays_flat(
        camera, order.rows, order.cols, jitter[0:2], height, width,
        lens_u=jitter[2:4],
    )
    state = initial_path_state(origins, directions, cfg.spectrum_samples, pids)
    uniforms = bounce_uniforms(
        cfg, wkey, fi, jnp.int32(0), pids, height, width,
        with_env=scene.env is not None,
    )
    state, pack = trace_bounce(
        scene, cfg, intersect, jnp.int32(0), state, uniforms,
        coherent=True, defer_shadow=True,
    )
    wmin, winv = scene_sort_bounds(scene)
    return sort_wavefront(state, wmin, winv, pack, lowering="gather")


def walk_lane_ops(lay, cfg: RenderConfig, o, d, active, t_max=None):
    """Kernel-measured lane-op accounting for one window walk over (o, d):
    returns (spent, useful, live_rays).

    ``spent``  = triangle-row tests paid, summed over every lane of every
                 tile (each tested row costs the full tile width — the
                 block-granularity waste the ROADMAP calls out);
    ``useful`` = row tests whose owning-leaf predicate was true for that
                 lane (the demand actually served).
    Box/navigation lane-ops are excluded (measured ~10% of the walk).
    """
    from ..ops.pallas_traverse import intersect_bvh_window

    raw, _ = intersect_bvh_window(
        o, d, lay, active=active, t_max=t_max, tile=cfg.secondary_tile,
        prepass=cfg.traversal_prepass, chain=cfg.secondary_chain,
        window=cfg.secondary_window, mtblock=cfg.secondary_mtblock,
        tritest=cfg.tritest, raw=True, with_counts=True,
    )
    spent = float(jnp.sum(raw[6]))
    useful = float(jnp.sum(raw[7]))
    live = float(jnp.sum(active.astype(jnp.float32)))
    return spent, useful, live


# v5e VPU peak, f32 lane-ops/s: 4 (8, 128) vector ALUs at ~0.94 GHz.
VPU_PEAK_LANE_OPS = 4 * 8 * 128 * 0.94e9
# vector ops per triangle-row test (plane evals + accept + latch amortized):
# Baldwin-Weber ~14, Moller-Trumbore ~17 (ops/pallas_traverse.py:_hit8).
OPS_PER_ROW_TEST = {"bw": 14.0, "mt": 17.0}


def utilization_report(
    scene: Scene,
    cfg: RenderConfig,
    lay,
    height: int,
    width: int,
    intersect,
    traced_per_frame: float,
    frame_time_s: float,
    spectrum_planes: int | None = None,
) -> dict:
    """Machine-checkable walk-utilization block for the bench JSON.

    Lane-op numbers are MEASURED in-kernel (walk_lane_ops) on the frame's
    first secondary wavefront — path rays and their NEE shadow queries, the
    workload that dominates the frame (r4 ablation: traversal+resolve = 81%).
    ``est_frame_*`` scale the per-ray economics by the exact traced-ray
    count; ``est_vpu_peak_pct`` divides the implied vector-op rate by the
    VPU peak.  ``est_hbm_gb_per_s`` is a MODEL, not a measurement: per-bounce
    full-width wavefront traffic (sort read+write of every payload plane +
    the resolve row gather), a lower bound that ignores ladder width cuts
    and kernel-internal traffic.

    Honesty limits, stated in the emitted block itself:
    * the probe wavefront is ONE 1-spp wavefront; with fused samples the
      production lane density is higher and per-ray economics improve
      ~30%/2x (r4c curve), so a ``density_caveat`` field flags spp > 1
      (the HBM byte model DOES scale by spp: total lanes per frame).
    * shadow lanes are priced under the secondary WINDOW kernel on the
      nearest-hit layout; production occlusion runs the cheaper v1 kernel
      on the leaf8 layout (no count instrumentation), so the combined
      spent/ray OVERSTATES the shadow share — ``shadow_pricing`` says so.
    * only the window kernel is instrumented; other traversal_kernel
      values raise (bench catches and degrades to an error field).
    """
    if cfg.traversal_kernel != "window":
        raise NotImplementedError(
            "utilization telemetry instruments the window kernel only; "
            f"traversal_kernel={cfg.traversal_kernel!r} walks are unpriced")
    st, pk = first_secondary_wavefront(
        scene, cfg, height, width, intersect=intersect)
    sp_p, us_p, live_p = walk_lane_ops(
        lay, cfg, st.origin, st.direction, st.alive)
    sp_s, us_s, live_s = walk_lane_ops(
        lay, cfg, st.origin, pk.to_light, pk.ok, t_max=pk.cap)
    spent, useful = sp_p + sp_s, us_p + us_s
    rays = max(live_p + live_s, 1.0)
    ops_row = OPS_PER_ROW_TEST[cfg.tritest]
    spent_per_ray = spent / rays
    est_frame_ops = spent_per_ray * traced_per_frame * ops_row
    # total wavefront lanes PER FRAME across all fused/sequential samples
    n_lanes = height * width * cfg.samples_per_frame
    s = cfg.spectrum_samples if spectrum_planes is None else spectrum_planes
    planes = 13 + 3 * s + 2  # sort_wavefront's shadow-carrying operand count
    sort_bytes = planes * n_lanes * 4 * 2 * max(cfg.max_path_length - 1, 0)
    gather_bytes = (lay.tris.shape[1] * 4 + 8) * n_lanes * cfg.max_path_length
    out = {
        "wavefront": "bounce-1 sorted secondary (path + NEE shadow)",
        "live_rays": int(rays),
        "spent_lane_ops_per_ray": round(spent_per_ray, 1),
        "useful_lane_ops_per_ray": round(useful / rays, 1),
        "mt_lane_utilization": round(useful / max(spent, 1.0), 4),
        "est_vpu_peak_pct": round(
            100.0 * est_frame_ops / frame_time_s / VPU_PEAK_LANE_OPS, 4),
        "est_hbm_gb_per_s_model": round(
            (sort_bytes + gather_bytes) / frame_time_s / 1e9, 2),
        "shadow_pricing": "window kernel on the nearest-hit layout "
                          "(production occlusion uses the cheaper v1 leaf8 "
                          "path — combined spent/ray is an upper bound)",
    }
    if cfg.samples_per_frame > 1:
        out["density_caveat"] = (
            "per-ray economics measured at 1-spp lane density; fused "
            "production wavefronts are denser and cheaper per ray")
    return out
