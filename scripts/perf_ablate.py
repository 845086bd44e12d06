"""Attribute full-frame cost to pipeline stages by ablation at 1080p.

The fusion-table analysis (docs/ROADMAP.md round-4 notes) says the frame is
now majority LINEAR stages (payload gather + shade + sort + RNG), not the
BVH walk.  This script measures that split directly on the REAL jitted
frame by monkeypatching one stage at a time:

  real-full      the production frame (== bench.py's configuration)
  fake-full      intersector replaced by a constant-hit stub -> the whole
                 traversal+resolve cost drops out; what remains is the
                 linear pipeline L (shade math, RNG, select chains, sorts,
                 ladder glue, accumulate)
  fake-nosort    L without the wavefront sorts (cfg.sort_rays=False; in
                 fake mode the walk cannot be slowed by unsorted rays, so
                 the delta is the sort machinery itself + ladder glue)
  fake-constrng  L with bounce_uniforms returning constants -> delta = the
                 counter-hash RNG supply
  fake-constsel  L with select_cols/select_light_index returning row 0 ->
                 delta = the compare/select table chains
  fake-allconst  both of the above at once (fusion interactions)

Traversal+resolve cost ~= real-full - fake-full; perf_decompose.py further
splits walk vs payload resolve.  Stage patches are tracing-time: each
variant builds its own Renderer AFTER installing the patches.
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
if os.environ.get("JAX_PLATFORMS"):
    # the site hook registers the axon TPU plugin eagerly; the config API is
    # what actually wins over it (same pattern as tests/conftest.py)
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402

import tpu_pathtracer.render.wavefront as wf  # noqa: E402
import tpu_pathtracer.renderer as renderer_mod  # noqa: E402
from tpu_pathtracer.config import RenderConfig  # noqa: E402
from tpu_pathtracer.ops.intersect import HitShade  # noqa: E402
from tpu_pathtracer.renderer import Renderer  # noqa: E402


def fake_make_intersector(scene, cfg, lay=None, lay_occl=None):
    """Constant-hit intersector: every live lane hits triangle (lane % T) at
    t = 1.5 with a fixed normal — zero traversal work, full shade work."""
    num_tris = scene.p0.shape[1]
    num_mats = scene.mat_type.shape[0]

    def fn(o, d, active, t_max=None, coherent=False):
        del t_max, coherent
        n = o.shape[1]
        lane = jnp.arange(n, dtype=jnp.int32)
        live = active if active.dtype == jnp.bool_ else active > 0
        t = jnp.where(live, jnp.float32(1.5), jnp.inf)
        dlen = jax.lax.rsqrt(jnp.maximum((d * d).sum(0), 1e-20))
        return HitShade(
            t=t,
            u=jnp.full((n,), 0.25, jnp.float32),
            v=jnp.full((n,), 0.25, jnp.float32),
            tri=lane % num_tris,
            mat=lane % num_mats,
            light=jnp.full((n,), -1, jnp.int32),
            pos=o + d * (jnp.where(jnp.isfinite(t), t, 0.0) * dlen)[None],
            normal=-d * dlen[None],
        )

    return fn


def const_bounce_uniforms(cfg, key, frame, bounce, pids, full_height,
                          full_width, with_env=False):
    n = pids.shape[0]
    half = jnp.full((n,), 0.5, jnp.float32)
    pair = jnp.full((2, n), 0.5, jnp.float32)
    out = {
        "light_select": half,
        "light_bary": pair,
        "lobe": half,
        "bounce_dir": pair,
    }
    if with_env:
        out.update(env_select=half, env_alias=half, env_jit=pair)
    return out


def const_select_cols(table, idx):
    expand = (slice(None),) * (table.ndim - 1) + (jnp.newaxis,)
    return jnp.broadcast_to(table[..., 0][expand], table.shape[:-1] + idx.shape)


def const_select_light_index(u, cdf):
    return jnp.zeros(u.shape, jnp.int32)


def time_frames(r, reps):
    r.step()
    r.sync()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        r.step()
        r.sync()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="CornellBox-Water-plastic")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--variants", default=(
        "real-full,fake-full,fake-nosort,fake-noladder,fake-constrng,"
        "fake-constsel,fake-allconst"))
    args = ap.parse_args()

    orig = {
        "mk": renderer_mod.make_intersector,
        "bu": wf.bounce_uniforms,
        "sc": wf.select_cols,
        "sl": wf.select_light_index,
    }

    def install(fake=False, constrng=False, constsel=False):
        renderer_mod.make_intersector = (
            fake_make_intersector if fake else orig["mk"])
        wf.bounce_uniforms = const_bounce_uniforms if constrng else orig["bu"]
        wf.select_cols = const_select_cols if constsel else orig["sc"]
        wf.select_light_index = (
            const_select_light_index if constsel else orig["sl"])

    plans = {
        "real-full": ({}, {}),
        "fake-full": ({"fake": True}, {}),
        "fake-nosort": ({"fake": True}, {"sort_rays": False}),
        "fake-noladder": ({"fake": True}, {"live_ladder": 0}),
        "fake-constrng": ({"fake": True, "constrng": True}, {}),
        "fake-constsel": ({"fake": True, "constsel": True}, {}),
        "fake-allconst": ({"fake": True, "constrng": True, "constsel": True}, {}),
    }

    results = {}
    for name in args.variants.split(","):
        patches, cfg_over = plans[name]
        install(**patches)
        cfg = RenderConfig(samples_per_frame=1, frames_in_flight=1,
                           **cfg_over)
        t0 = time.perf_counter()
        r = Renderer(args.scene, width=args.width, height=args.height, cfg=cfg)
        t = time_frames(r, args.reps)
        results[name] = t
        print(f"{name:16s} frame {t*1e3:8.1f} ms   (setup+compile "
              f"{time.perf_counter()-t0-t*args.reps:6.1f} s)", flush=True)
        del r
    install()  # restore

    if "real-full" in results and "fake-full" in results:
        print(f"-> traversal+resolve ~ "
              f"{(results['real-full']-results['fake-full'])*1e3:8.1f} ms")
    for name, label in [("fake-nosort", "sort machinery"),
                        ("fake-noladder", "ladder glue"),
                        ("fake-constrng", "RNG supply"),
                        ("fake-constsel", "select chains")]:
        if name in results and "fake-full" in results:
            print(f"-> {label:18s} ~ "
                  f"{(results['fake-full']-results[name])*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
