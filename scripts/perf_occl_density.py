"""Occlusion-kernel tile retune at fused-wavefront density.

The occlusion walk's tile width (cfg.occlusion_tile = 6144) was tuned in
round 3 on 1x-density (2.07M-lane) shadow wavefronts.  The round-4 density
ladder (fuse4+rt2 = 8.73 Mrays/s, spp8/rt4 queued) quadruples-plus the lane
density, which shrinks the spatial extent each sorted shadow-tile spans —
the same union-economics shift that r4c re-checked for the nearest-hit
kernel (tile 768 stayed optimal there).  This sweep re-checks the occlusion
side: v1 capped walk (the bench scene has no env light, so anyhit=auto is
off) across occlusion_tile x density.

Workload: production-shaped shadow rays — f independent cosine-bounce draws
from the 1080p primary hits, production-sorted (the shadow pack rides the
bounce sort), then aimed at the ceiling light with the segment capped at the
light distance.  Timing syncs via an on-device scalar reduce (ROADMAP
measurement trap: never D2H the full output).

Usage: timeout 1800 python scripts/perf_occl_density.py > /tmp/occl_density.log 2>&1
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
from tpu_pathtracer.core.sampling import generate_diffuse_bounce  # noqa: E402
from tpu_pathtracer.models.camera import Camera, generate_rays_flat  # noqa: E402
from tpu_pathtracer.ops.pallas_traverse import intersect_bvh_pallas  # noqa: E402
from tpu_pathtracer.render.noise import pids_from_order  # noqa: E402
from tpu_pathtracer.render.order import make_order  # noqa: E402
from tpu_pathtracer.render.wavefront import (  # noqa: E402
    initial_path_state,
    sort_wavefront,
)
from tpu_pathtracer.scene import load_scene, scene_path  # noqa: E402

W, H = 1920, 1080


def make_shadow_workloads(scene, lay, fuses):
    """fuse -> (o, d, active, t_max): sorted production-shaped shadow rays."""
    order = make_order(H, W, 0, 1536)
    pids = pids_from_order(order, W)
    cam = Camera.reference_default()
    jitter = jnp.zeros((2, H * W), jnp.float32)
    o, d = generate_rays_flat(cam, order.rows, order.cols, jitter, H, W)
    hit = jax.jit(
        lambda o, d: intersect_bvh_pallas(o, d, lay, active=jnp.ones((o.shape[1],), bool))
    )(o, d)
    valid = jnp.isfinite(hit.t)
    so = hit.pos + hit.normal * 1e-4

    wmin = tuple(float(jnp.min(jnp.minimum(jnp.minimum(scene.p0[a], scene.p1[a]), scene.p2[a]))) for a in range(3))
    wmax = tuple(float(jnp.max(jnp.maximum(jnp.maximum(scene.p0[a], scene.p1[a]), scene.p2[a]))) for a in range(3))
    winv = tuple(1.0 / max(wmax[a] - wmin[a], 1e-6) for a in range(3))

    out = {}
    for fuse in fuses:
        os_, ds_, al_, pd_ = [], [], [], []
        for s in range(fuse):
            u = jax.random.uniform(jax.random.PRNGKey(7 + s), (2, o.shape[1]))
            os_.append(so)
            ds_.append(generate_diffuse_bounce(u, hit.normal))
            al_.append(valid)
            pd_.append(pids + jnp.uint32(s * H * W))
        st = initial_path_state(
            jnp.concatenate(os_, axis=1), jnp.concatenate(ds_, axis=1),
            3, jnp.concatenate(pd_),
        )
        st = st._replace(alive=jnp.concatenate(al_))
        st = jax.jit(
            lambda s: sort_wavefront(s, wmin, winv, lowering="gather")
        )(st)
        # shadow rays FROM the sorted bounce origins toward a jittered point
        # on the ceiling light, capped at the light distance
        # same target as perf_window_ab's occlusion workload (a point on the
        # scene's ceiling light), with a small jitter standing in for the
        # per-lane light-sample spread
        uj = jax.random.uniform(jax.random.PRNGKey(99), (2, st.origin.shape[1]))
        lp = jnp.stack([
            0.0 + 0.2 * (uj[0] - 0.5),
            jnp.full_like(uj[0], 1.95),
            1.2 + 0.2 * (uj[1] - 0.5),
        ])
        tl = lp - st.origin
        dist = jnp.sqrt(jnp.sum(tl * tl, axis=0))
        tl = tl / jnp.maximum(dist, 1e-30)[None]
        out[fuse] = (st.origin, tl, st.alive.astype(jnp.float32),
                     dist - 4e-4)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--scene", default="CornellBox-Water-plastic")
    ap.add_argument("--fuses", default="1,4")
    ap.add_argument("--tiles", default="3072,6144,12288")
    ap.add_argument("--leaf", type=int, default=16,
                    help="occlusion_leaf_size (r3 default 16)")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    float(jnp.ones((8, 8)).sum())
    print("device execute OK", flush=True)

    scene = load_scene(scene_path(args.scene))
    lay = build_layout(scene, leaf_size=56)
    lay_occl = build_layout(scene, leaf_size=args.leaf)
    fuses = [int(x) for x in args.fuses.split(",")]
    workloads = make_shadow_workloads(scene, lay, fuses)

    for fuse in fuses:
        o, d, a, cap = workloads[fuse]
        n = o.shape[1]
        for tile in (int(x) for x in args.tiles.split(",")):
            fn = jax.jit(lambda o, d, a, c, _t=tile: jnp.sum(
                intersect_bvh_pallas(
                    o, d, lay_occl, active=a, tile=_t, t_max=c,
                    resolve=False, prepass=0,
                ).t[::997]
            ))
            float(fn(o, d, a, cap))  # compile + first run
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                float(fn(o, d, a, cap))
                ts.append(time.perf_counter() - t0)
            tmin, tmed = min(ts), float(np.median(ts))
            print(f"fuse{fuse} tile{tile:5d}: best {tmin*1e3:8.2f} ms  "
                  f"med {tmed*1e3:8.2f} ms  {n/tmin/1e6:8.2f} Mrays/s",
                  flush=True)


if __name__ == "__main__":
    main()
