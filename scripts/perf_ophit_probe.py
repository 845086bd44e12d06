"""Price the per-row op components of the leaf intersection test.

The r5 kernel probe (scripts/perf_kernel_probe.py) killed the structural
candidates: the dense sweep loses 3x to the window walk and the fused
2N-lane walk loses 15% to the separate pair — the window kernel is already
demand-efficient, so the remaining headroom is PER-ROW OP COST.  This
microbench prices each component of the Baldwin-Weber row test on a
fixed-work dense march (fori_loop over every block: identical work for
every variant, so deltas are attributable to ops alone, unlike the window
walk where best_t feedback changes the walk):

  full-bw    the production _hit8 bw body + argmin latch (anchor)
  nodiv      reciprocal replaced by a multiply (WRONG results, same shape)
  nouv       u/v plane evals + accepts dropped (t-plane only)
  nopick     argmin latch keeps the min-reduce, drops the row-id pick
  rows-latch sequential per-row strict-< latch (the "rows" alternative)
  mt         the Moller-Trumbore block for comparison

All variants return garbage except full-bw — timing only.  Deltas feed the
roofline doc (BASELINE.md): what a divide-free / slimmer accept could buy.

Usage:
    timeout 1800 python scripts/perf_ophit_probe.py > /tmp/probe_ophit.log 2>&1
"""
from __future__ import annotations

import argparse
import functools
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from tpu_pathtracer.ops.pallas_traverse import _argmin_pick  # noqa: E402

N = 1920 * 1080          # production wavefront lanes
T8 = 7112                # bench scene's padded BW row count (mult of 8)


def _bw_rowtest(tb, dxyz, oxyz, variant):
    """(K, 16) BW rows x TILE lanes -> ok, tt — with op ablations."""
    ox, oy, oz = oxyz
    dx, dy, dz = dxyz
    n0x, n0y, n0z, d0 = tb[:, 0:1], tb[:, 1:2], tb[:, 2:3], tb[:, 3:4]
    den = n0x * dx + n0y * dy + n0z * dz
    num = n0x * ox + n0y * oy + n0z * oz + d0
    if variant == "nodiv":
        inv = den  # WRONG: prices the reciprocal
    else:
        inv = jnp.where(den != 0.0, 1.0 / den, 0.0)
    tt = -num * inv
    if variant == "nouv":
        ok = (den != 0.0) & (tt > 0.0)
        return ok, tt
    n1x, n1y, n1z, d1 = tb[:, 4:5], tb[:, 5:6], tb[:, 6:7], tb[:, 7:8]
    n2x, n2y, n2z, d2 = tb[:, 8:9], tb[:, 9:10], tb[:, 10:11], tb[:, 11:12]
    px = ox + tt * dx
    py = oy + tt * dy
    pz = oz + tt * dz
    u = n1x * px + n1y * py + n1z * pz + d1
    v = n2x * px + n2y * py + n2z * pz + d2
    ok = (den != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (tt > 0.0)
    return ok, tt


def _mt_rowtest(tb, dxyz, oxyz):
    """Production MT block math (ops/pallas_traverse.py:_mt_block shape)."""
    ox, oy, oz = oxyz
    dx, dy, dz = dxyz
    ax, ay, az = tb[:, 0:1], tb[:, 1:2], tb[:, 2:3]
    e1x, e1y, e1z = tb[:, 3:4], tb[:, 4:5], tb[:, 5:6]
    e2x, e2y, e2z = tb[:, 6:7], tb[:, 7:8], tb[:, 8:9]
    pvx = dy * e2z - dz * e2y
    pvy = dz * e2x - dx * e2z
    pvz = dx * e2y - dy * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    inv = jnp.where(det != 0.0, 1.0 / det, 0.0)
    tx, ty, tz = ox - ax, oy - ay, oz - az
    u = (tx * pvx + ty * pvy + tz * pvz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    tt = (e2x * qx + e2y * qy + e2z * qz) * inv
    ok = (det != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (tt > 0.0)
    return ok, tt


def _kernel(rays_ref, tris_ref, out_ref, *, nblocks, mtblock, variant):
    oxyz = (rays_ref[0, :], rays_ref[1, :], rays_ref[2, :])
    dxyz = (rays_ref[3, :], rays_ref[4, :], rays_ref[5, :])
    tile = rays_ref.shape[1]
    best_t = jnp.full((tile,), jnp.inf, jnp.float32)
    best_i = jnp.full((tile,), -1.0, jnp.float32)
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (mtblock, 1), 0)

    def body(i, bst):
        bt, bi = bst
        r0 = i * mtblock
        tb = tris_ref[pl.ds(r0, mtblock), :]
        if variant == "mt":
            ok, tt = _mt_rowtest(tb, dxyz, oxyz)
        else:
            ok, tt = _bw_rowtest(tb, dxyz, oxyz, variant)
        row_ids = (r0 + iota_b).astype(jnp.float32)
        if variant == "nopick":
            ttm = jnp.where(ok & (tt < bt[None, :]), tt, jnp.inf)
            return jnp.minimum(bt, jnp.min(ttm, axis=0)), bi
        if variant == "rows-latch":
            for j in range(mtblock):
                okj = ok[j, :] & (tt[j, :] < bt)
                bt = jnp.where(okj, tt[j, :], bt)
                bi = jnp.where(okj, row_ids[j, 0], bi)
            return bt, bi
        upd, tmin, pick = _argmin_pick(ok, tt, bt, mtblock)
        ridf = jnp.broadcast_to(row_ids, tt.shape)
        return (jnp.where(upd, tmin, bt), jnp.where(upd, pick(ridf), bi))

    best_t, best_i = jax.lax.fori_loop(0, nblocks, body, (best_t, best_i))
    out_ref[0, :] = best_t
    out_ref[1, :] = best_i


def run_variant(variant, rays, tris, tile, mtblock, reps):
    nblocks = T8 // mtblock
    total = rays.shape[1]
    kern = functools.partial(_kernel, nblocks=nblocks, mtblock=mtblock,
                             variant=variant)
    fn = pl.pallas_call(
        kern,
        grid=(total // tile,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda g: (0, g), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, tile), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, total), jnp.float32),
    )
    sync = jax.jit(lambda r, t: jnp.sum(fn(r, t)[0, ::4097]))
    t0 = time.perf_counter()
    float(sync(rays, tris))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(sync(rays, tris))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tile", type=int, default=768)
    ap.add_argument("--mtblock", type=int, default=16)
    ap.add_argument("--variants",
                    default="full-bw,nodiv,nouv,nopick,rows-latch,mt")
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", flush=True)
    float(jnp.ones((8, 8)).sum())
    print("device execute OK", flush=True)

    key = jax.random.PRNGKey(0)
    rays = jax.random.normal(key, (8, N), jnp.float32)
    k2 = jax.random.fold_in(key, 1)
    # 16-col table serves both bw (cols 0-11) and mt (cols 0-8) shapes
    tris = jax.random.normal(k2, (T8, 16), jnp.float32)
    rays, tris = jax.block_until_ready((rays, tris))

    rows_total = (T8 // args.mtblock) * args.mtblock * N
    print(f"lanes={N} rows/lane={T8} row-tests={rows_total:.3g}", flush=True)

    anchor = None
    for variant in args.variants.split(","):
        ms, compile_s = run_variant(
            variant, rays, tris, args.tile, args.mtblock, args.reps)
        ns_row = ms * 1e6 / rows_total * 1e3  # ps per row-test
        delta = "" if anchor is None else f"  {100 * (ms - anchor) / anchor:+6.1f}%"
        if variant == "full-bw":
            anchor = ms
        print(f"ROW {variant:10s} {ms:8.1f} ms  {ns_row:6.2f} ps/rowtest  "
              f"compile={compile_s:5.1f}s{delta}", flush=True)


if __name__ == "__main__":
    main()
