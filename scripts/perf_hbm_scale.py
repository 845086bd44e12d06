"""Production-scale traversal bench: HBM-streaming kernel vs the fallbacks.

VERDICT r3 item 5: the HBM window kernel (triangle table in pltpu.ANY,
demanded MT blocks DMA'd through double-buffered VMEM scratch) landed in the
round-3 tail and is gated by tests/test_scale.py, but was never BENCHED
against the pure-JAX walker it replaces past the VMEM ceiling.  This script
builds the same ~130K-triangle displaced terrain the tests use and times,
on a 2M-ray workload (coherent top-down rays + a direction-scrambled variant
standing in for bounce wavefronts):

  jax_walker   ops/traverse.intersect_bvh — the pre-r3 fallback
  hbm_window   intersect_bvh_window(hbm=True) — the production-scale kernel
  vmem_window  intersect_bvh_window(hbm=False) — only if the tables still
               fit (130K tris is right at the ~12 MB budget; Mosaic may
               refuse — failure is reported, not fatal)

Usage: timeout 1800 python scripts/perf_hbm_scale.py > /tmp/hbm_scale.log 2>&1
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
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# reuse the test suite's terrain so the bench measures exactly what the
# gates verify
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))
from test_scale import _terrain_mesh  # noqa: E402

from tpu_pathtracer.accel import build_layout  # noqa: E402
from tpu_pathtracer.ops.pallas_traverse import intersect_bvh_window  # noqa: E402
from tpu_pathtracer.ops.traverse import intersect_bvh  # noqa: E402
from tpu_pathtracer.scene.scene import build_scene  # noqa: E402

N = 2_073_600  # one 1080p wavefront


def rays(scene, scrambled: bool, seed=11):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.uniform(k1, (N,), minval=-1.0, maxval=1.0)
    z = jax.random.uniform(k2, (N,), minval=-1.0, maxval=1.0)
    o = jnp.stack([x, jnp.full((N,), 1.5), z])
    if scrambled:
        d = jax.random.normal(k3, (3, N))
        d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
        # keep them pointing down-ish so most rays hit the terrain
        d = d.at[1].set(-jnp.abs(d[1]) - 0.1)
        d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    else:
        d = jnp.broadcast_to(jnp.array([0.0, -1.0, 0.0])[:, None], (3, N))
    # morton-ish coherence: sort by (x, z) cell like the wavefront sort would
    cell = (jnp.clip((x + 1) * 16, 0, 31).astype(jnp.int32) * 32
            + jnp.clip((z + 1) * 16, 0, 31).astype(jnp.int32))
    order = jnp.argsort(cell)
    return o[:, order], d[:, order]


def timeit(fn, *args, reps=4):
    out = fn(*args)
    float(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    float(jnp.ones((4,)).sum())

    scene = build_scene(_terrain_mesh())
    lay = build_layout(scene)
    print(f"tris={lay.num_tris} nodes={lay.num_nodes}", flush=True)

    act = jnp.ones((N,), jnp.float32)
    variants = {
        "jax_walker": jax.jit(lambda o, d: jnp.sum(
            intersect_bvh(o, d, lay).t[::997])),
        "hbm_window": jax.jit(lambda o, d: jnp.sum(
            intersect_bvh_window(
                o, d, lay, active=act, tile=768, window=16, mtblock=16,
                chain=6, raw=True, hbm=True)[0][0, ::997])),
        "vmem_window": jax.jit(lambda o, d: jnp.sum(
            intersect_bvh_window(
                o, d, lay, active=act, tile=768, window=16, mtblock=16,
                chain=6, raw=True, hbm=False)[0][0, ::997])),
    }

    for wname, scram in (("coherent", False), ("scrambled", True)):
        o, d = rays(scene, scram)
        for vname, fn in variants.items():
            try:
                t = timeit(fn, o, d, reps=args.reps)
                print(f"{wname:10s} {vname:12s} {t*1e3:9.2f} ms  "
                      f"{N/t/1e6:7.1f} Mrays/s", flush=True)
            except Exception as e:  # noqa: BLE001 — vmem variant may not fit
                print(f"{wname:10s} {vname:12s} FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)

    # parity: hbm and jax walker must agree on hit distances
    o, d = rays(scene, True)
    h_jax = jax.jit(lambda o, d: intersect_bvh(o, d, lay).t)(o, d)
    h_hbm = jax.jit(lambda o, d: intersect_bvh_window(
        o, d, lay, active=act, tile=768, window=16, mtblock=16, chain=6,
        hbm=True).t)(o, d)
    a = np.asarray(h_jax)
    b = np.asarray(h_hbm)
    both = np.isfinite(a) & np.isfinite(b)
    print(f"parity: valid-match {(np.isfinite(a) == np.isfinite(b)).mean():.6f}"
          f"  max|dt| {np.abs(a[both] - b[both]).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
