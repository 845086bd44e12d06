"""Decompose traversal kernel cost: launch / walk / resolve phases."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu_pathtracer.accel import build_layout  # noqa: E402
from tpu_pathtracer.core.sampling import generate_diffuse_bounce  # noqa: E402
from tpu_pathtracer.models.camera import Camera, generate_rays_flat  # noqa: E402
from tpu_pathtracer.ops.pallas_traverse import intersect_bvh_pallas  # noqa: E402
from tpu_pathtracer.render.noise import pids_from_order  # noqa: E402
from tpu_pathtracer.render.order import make_order  # noqa: E402
from tpu_pathtracer.render.wavefront import initial_path_state, sort_wavefront  # noqa: E402
from tpu_pathtracer.scene import load_scene, scene_path  # noqa: E402

W, H = 1920, 1080
N = W * H


def timeit(fn, *args, reps=5):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    scene = load_scene(scene_path("CornellBox-Water-plastic"))
    lay = build_layout(scene)
    print(f"nodes={lay.num_nodes} tris={lay.num_tris} max_leaf={lay.max_leaf}", flush=True)

    order = make_order(H, W, 0, 1536)
    pids = pids_from_order(order, W)
    cam = Camera.reference_default()
    jitter = jnp.zeros((2, N), jnp.float32)
    o, d = generate_rays_flat(cam, order.rows, order.cols, jitter, H, W)

    isect = jax.jit(lambda o, d, a: intersect_bvh_pallas(o, d, lay, active=a))
    isect_noresolve = jax.jit(
        lambda o, d, a: intersect_bvh_pallas(o, d, lay, active=a, resolve=False,
                                             t_max=jnp.full((N,), 1e30)))

    hit = isect(o, d, jnp.ones((N,), jnp.float32))
    valid = jnp.isfinite(hit.t)
    u = jax.random.uniform(jax.random.PRNGKey(7), (2, N))
    nd = generate_diffuse_bounce(u, hit.normal)
    so = hit.pos + hit.normal * 1e-4
    st = initial_path_state(so, nd, 3, pids)._replace(alive=valid)
    wmin = tuple(float(jnp.min(jnp.minimum(jnp.minimum(scene.p0[a], scene.p1[a]), scene.p2[a]))) for a in range(3))
    wmax = tuple(float(jnp.max(jnp.maximum(jnp.maximum(scene.p0[a], scene.p1[a]), scene.p2[a]))) for a in range(3))
    winv = tuple(1.0 / max(wmax[a] - wmin[a], 1e-6) for a in range(3))
    sts = jax.jit(lambda s: sort_wavefront(s, wmin, winv))(st)
    do, dd = sts.origin, sts.direction
    da = sts.alive.astype(jnp.float32)

    ones = jnp.ones((N,), jnp.float32)
    zeros_a = jnp.zeros((N,), jnp.float32)

    # 1. all-dead: launch overhead only
    t_dead = timeit(isect, o, d, zeros_a)
    print(f"all-dead   (launch only):        {t_dead*1e3:8.2f} ms", flush=True)

    # 2. perfectly coherent: one ray replicated
    oc = jnp.broadcast_to(o[:, :1], o.shape)
    dc = jnp.broadcast_to(d[:, :1], d.shape)
    t_coh = timeit(isect, oc, dc, ones)
    print(f"coherent   (1 ray replicated):   {t_coh*1e3:8.2f} ms", flush=True)

    # 3. primary with/without resolve
    t_prim = timeit(isect, o, d, ones)
    t_prim_nr = timeit(isect_noresolve, o, d, ones)
    print(f"primary    resolve:              {t_prim*1e3:8.2f} ms", flush=True)
    print(f"primary    no-resolve:           {t_prim_nr*1e3:8.2f} ms", flush=True)

    # 4. diffuse with/without resolve
    t_dif = timeit(isect, do, dd, da)
    t_dif_nr = timeit(isect_noresolve, do, dd, da)
    print(f"diffuse    resolve:              {t_dif*1e3:8.2f} ms", flush=True)
    print(f"diffuse    no-resolve:           {t_dif_nr*1e3:8.2f} ms", flush=True)

    # 5. step-count census on CPU-side simulation of the min-walk (numpy)
    nodes = np.asarray(lay.nodes)
    meta = np.asarray(lay.nodes_meta)
    on = np.asarray(do)[:, :1536 * 8]
    dn = np.asarray(dd)[:, :1536 * 8]
    an = np.asarray(da)[:1536 * 8] > 0
    steps_hist = []
    for t0_ in range(0, 1536 * 8, 1536):
        sl = slice(t0_, t0_ + 1536)
        steps = census_tile(nodes, meta, on[:, sl], dn[:, sl], an[sl])
        steps_hist.append(steps)
    print(f"union steps/tile (first 8 diffuse tiles): {steps_hist}", flush=True)


def census_tile(nodes, meta, o, d, act):
    """Simulate the tile-synchronous min-walk, count steps (numpy, exactish)."""
    n = o.shape[1]
    M = nodes.shape[0]
    inv = np.where(np.abs(d) > 1e-12, 1.0 / d, np.inf)
    cur = np.where(act, 0, M).astype(np.int64)
    best = np.full(n, np.inf, np.float32)
    steps = 0
    while cur.min() < M:
        node = cur.min()
        row = nodes[node]
        mask = cur == node
        t0 = (row[0:3, None] - o) * inv
        t1 = (row[3:6, None] - o) * inv
        enter = np.minimum(t0, t1).max(0)
        exit_ = np.maximum(t0, t1).min(0)
        hit = mask & (enter <= exit_) & (exit_ > 0) & (enter < best)
        count = meta[node, 1] & 63
        # approximate leaf hits: shrink best to enter distance (cheap proxy)
        if count > 0:
            best = np.where(hit, np.minimum(best, np.maximum(enter, 1e-3) * 1.05), best)
        nxt = np.where(hit & (count == 0), node + 1, meta[node, 0])
        cur = np.where(mask, nxt, cur)
        steps += 1
    return steps


if __name__ == "__main__":
    main()
