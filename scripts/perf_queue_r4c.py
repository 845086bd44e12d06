"""Round-4c sweep: walk throughput vs lane DENSITY x tile width x leaf size.

The r4 stage ablation (docs/ROADMAP.md) put traversal+resolve at ~81% of the
frame, and the known density curve (isolated diffuse walk: 9.8 Mrays/s at 2M
lanes, 13.3 at 4M, 17.4 at 8M) says density is the main remaining per-chip
lever.  This sweep asks whether the production secondary-kernel shape
(tile 768 / window 8 / mtblock 16 / leaf 56) is still optimal at 2x density:
higher density packs more lanes per demanded leaf, so the leaf-block economics
shift toward wider tiles and fatter leaves.

Workloads: the production diffuse-bounce wavefront (1080p hits, cosine
resampled) at 1x (2.07M lanes) and a fused-2x twin (two independent direction
draws per hit, concatenated, production-sorted) at 4.15M lanes.  Workload prep
sorts with lowering="gather" — bit-identical order to the variadic production
sort (lax.sort is stable) but compiles in seconds, keeping this sweep's
compiles cheap.

Timing: raw kernel output (no payload resolve), synced via an on-device
scalar reduce (a D2H pull of the (8, N) output would add ~1.4 s of relay
transfer and void the numbers — see docs/ROADMAP.md measurement trap).

Usage: python scripts/perf_queue_r4c.py [--reps 5] > /tmp/q_r4c.log 2>&1
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

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu_pathtracer.accel import build_layout  # noqa: E402
from tpu_pathtracer.core.sampling import generate_diffuse_bounce  # noqa: E402
from tpu_pathtracer.models.camera import Camera, generate_rays_flat  # noqa: E402
from tpu_pathtracer.ops.pallas_traverse import (  # noqa: E402
    intersect_bvh_pallas,
    intersect_bvh_window,
)
from tpu_pathtracer.render.noise import pids_from_order  # noqa: E402
from tpu_pathtracer.render.order import make_order  # noqa: E402
from tpu_pathtracer.render.wavefront import (  # noqa: E402
    initial_path_state,
    sort_wavefront,
)
from tpu_pathtracer.scene import load_scene, scene_path  # noqa: E402

W, H = 1920, 1080


def make_workloads(scene, lay):
    """name -> (o, d, act) device arrays: sorted diffuse wavefronts at
    1x (2.07M lanes) and 2x (4.15M) density."""
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

    def density_workload(fuse: int):
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
        return (st.origin, st.direction, st.alive.astype(jnp.float32))

    return {"d2M": density_workload(1), "d4M": density_workload(2)}


def time_variant(fn, args, reps):
    sync = jax.jit(lambda *a: jnp.sum(fn(*a)[0][0]))
    float(sync(*args))  # compile + first run
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(sync(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--scene", default="CornellBox-Water-plastic")
    ap.add_argument("--leaves", default="56,63")
    ap.add_argument("--tiles", default="768,1536,3072")
    args = ap.parse_args()

    scene = load_scene(scene_path(args.scene))
    lay56 = build_layout(scene, leaf_size=56)
    workloads = make_workloads(scene, lay56)
    layouts = {56: lay56}
    for leaf in (int(x) for x in args.leaves.split(",")):
        if leaf not in layouts:
            layouts[leaf] = build_layout(scene, leaf_size=leaf)

    for wname, (o, d, a) in workloads.items():
        n = o.shape[1]
        for leaf in (int(x) for x in args.leaves.split(",")):
            lay = layouts[leaf]
            for tile in (int(x) for x in args.tiles.split(",")):
                fn = lambda o, d, a, _l=lay, _t=tile: intersect_bvh_window(
                    o, d, _l, active=a, tile=_t, prepass=32, chain=6,
                    window=8, mtblock=16, raw=True,
                )
                tmin, tmed = time_variant(fn, (o, d, a), args.reps)
                print(
                    f"{wname:4s} leaf{leaf:2d} tile{tile:4d}: "
                    f"best {tmin*1e3:8.2f} ms  med {tmed*1e3:8.2f} ms  "
                    f"{n/tmin/1e6:8.2f} Mrays/s", flush=True,
                )


if __name__ == "__main__":
    main()
