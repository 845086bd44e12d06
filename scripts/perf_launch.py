"""Isolate the Pallas launch fixed cost: tables vs grid vs kernel body.

All timed functions reduce to a scalar ON DEVICE so the host pull is 4 bytes
(the axon relay transfers at ~300 MB/s; pulling a full (N,) plane adds ~28 ms
of pure transfer and a (8, N) plane ~1.5 s — round-1's measurement bug).
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from tpu_pathtracer.accel import build_layout  # noqa: E402
from tpu_pathtracer.ops.pallas_traverse import (  # noqa: E402
    intersect_bvh_pallas,
    intersect_bvh_window,
)
from tpu_pathtracer.scene import load_scene, scene_path  # noqa: E402

N = 1920 * 1080


def timeit(fn, *args, reps=7):
    out = fn(*args)
    float(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def noop_kernel(rays_ref, *rest):
    out_ref = rest[-1]
    out_ref[0, :] = rays_ref[0, :]
    for k in range(1, 8):
        out_ref[k, :] = jnp.zeros_like(rays_ref[0, :])


def run_noop(rays, tables, tile):
    total = rays.shape[1]
    grid = total // tile
    in_specs = [pl.BlockSpec((8, tile), lambda g: (0, g), memory_space=pltpu.VMEM)]
    for _ in tables:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        noop_kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, total), jnp.float32),
    )(rays, *tables)
    return jnp.sum(out[0, ::997])


def main():
    scene = load_scene(scene_path("CornellBox-Water-plastic"))
    lay = build_layout(scene)
    rays = jnp.zeros((8, N), jnp.float32)  # active=0 everywhere
    o = rays[0:3]
    d = jnp.ones((3, N), jnp.float32)
    dead = jnp.zeros((N,), jnp.float32)

    tbl_v1 = [lay.nodes, lay.nodes_meta, lay.tris]
    tbl_v2 = [lay.nodes8, lay.meta4, lay.tris8]
    for nm, t in [("v1", tbl_v1), ("v2", tbl_v2)]:
        tot = sum(x.size * x.dtype.itemsize for x in t)
        print(f"{nm} tables: {[x.shape for x in t]} = {tot/1024:.0f} KB")

    for tile in (768, 1536, 3072, 6144):
        t_plain = timeit(jax.jit(functools.partial(run_noop, tables=[], tile=tile)), rays)
        t_tab = timeit(jax.jit(functools.partial(run_noop, tables=tbl_v1, tile=tile)), rays)
        t_tab2 = timeit(jax.jit(functools.partial(run_noop, tables=tbl_v2, tile=tile)), rays)
        n_prog = N // tile + (1 if N % tile else 0)
        print(
            f"tile={tile:5d} programs={n_prog:5d}  noop={t_plain*1e3:7.2f} ms"
            f"  +v1 tables={t_tab*1e3:7.2f} ms  +v2 tables={t_tab2*1e3:7.2f} ms",
            flush=True,
        )

    def dead_v1(o, d, a, tile):
        h = intersect_bvh_pallas(o, d, lay, active=a, tile=tile)
        return jnp.sum(h.u[::997])

    def dead_v2(o, d, a, tile):
        h = intersect_bvh_window(o, d, lay, active=a, tile=tile)
        return jnp.sum(h.u[::997])

    for tile in (1536, 3072, 6144):
        t_dead = timeit(jax.jit(functools.partial(dead_v1, tile=tile)), o, d, dead)
        print(f"v1 all-dead tile={tile:5d}: {t_dead*1e3:7.2f} ms", flush=True)
    for tile in (768, 1536, 3072):
        t_dead = timeit(jax.jit(functools.partial(dead_v2, tile=tile)), o, d, dead)
        print(f"v2 all-dead tile={tile:5d}: {t_dead*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
