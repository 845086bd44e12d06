"""Probe XLA TPU gather strategies for the payload-resolve row fetch.

The per-bounce payload resolve is ONE ``jnp.take(table, idx, axis=0)`` of
(N,) triangle indices from a small (T, 24..40) float32 table
(ops/pallas_traverse.py:resolve_window_payload).  Measured cost is ~31 ms
per 2M rows on v5e — per ROW, flat in width — which makes it the single
biggest linear-stage item in the frame (~250 ms/frame across 8 bounces,
docs/ROADMAP.md round-4 notes).  This script times drop-in alternatives so
the production gather can switch to whichever lowering is fastest:

  rows        jnp.take(table (T,C), idx, axis=0)        -> (N, C)   [baseline]
  cols_T      jnp.take(tableT (C,T), idx, axis=1)       -> (C, N)
  percol_1d   C separate jnp.take((T,), idx)            -> C x (N,)
  rows_bf16   baseline on a bfloat16 table
  rows_sorted baseline on PRE-SORTED indices (locality diagnostic only —
              production indices arrive morton-sorted, so this bounds what
              index coherence can buy)
  onehot_mxu  (N, T) one-hot @ (T, C) matmul in bf16, tiled over N —
              trades HBM gather for MXU flops (T <= ~8K tables only)

All timings use the on-device-scalar sync pattern (see the axon measurement
notes in docs/ROADMAP.md): reduce to a scalar, float() it, min over reps.
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


def timeit(fn, *args, reps=5):
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
    ap.add_argument("--n", type=int, default=2_073_600, help="lanes (1080p)")
    ap.add_argument("--t", type=int, default=7089, help="table rows")
    ap.add_argument("--cols", type=int, default=24)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    n, t, c = args.n, args.t, args.cols

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((t, c)), jnp.float32)
    table_t = jnp.asarray(np.asarray(table).T.copy())
    table_bf = table.astype(jnp.bfloat16)
    # production-like indices: morton-sorted lanes hit runs of nearby
    # triangles — model as piecewise-constant runs of ~20 with jitter
    runs = rng.integers(0, t, size=n // 20 + 1)
    idx_np = np.clip(
        np.repeat(runs, 20)[:n] + rng.integers(-3, 4, size=n), 0, t - 1
    )
    idx = jnp.asarray(idx_np, jnp.int32)
    idx_sorted = jnp.asarray(np.sort(idx_np), jnp.int32)

    def red(x):
        return jnp.sum(x.reshape(-1)[::1009])

    @jax.jit
    def rows(ix):
        return red(jnp.take(table, ix, axis=0))

    @jax.jit
    def cols_t(ix):
        return red(jnp.take(table_t, ix, axis=1))

    @jax.jit
    def percol_1d(ix):
        return sum(red(jnp.take(table_t[j], ix)) for j in range(c))

    @jax.jit
    def rows_bf16(ix):
        return red(jnp.take(table_bf, ix, axis=0).astype(jnp.float32))

    tile = 8192
    t_pad = (t + 127) // 128 * 128
    table_pad = jnp.pad(table, ((0, t_pad - t), (0, 0))).astype(jnp.bfloat16)

    @jax.jit
    def onehot_mxu(ix):
        def body(ix_tile):
            oh = (
                ix_tile[:, None] == jax.lax.broadcasted_iota(
                    jnp.int32, (tile, t_pad), 1)
            ).astype(jnp.bfloat16)
            return jnp.dot(oh, table_pad, preferred_element_type=jnp.float32)

        out = jax.lax.map(body, ix.reshape(-1, tile))
        return red(out)

    variants = {
        "rows": (rows, idx),
        "cols_T": (cols_t, idx),
        "percol_1d": (percol_1d, idx),
        "rows_bf16": (rows_bf16, idx),
        "rows_sorted": (rows, idx_sorted),
    }
    if n % tile == 0 and t_pad <= 16384:
        variants["onehot_mxu"] = (onehot_mxu, idx)

    print(f"n={n} t={t} cols={c} device={jax.devices()[0]}", flush=True)
    for name, (fn, ix) in variants.items():
        try:
            ms = timeit(fn, ix, reps=args.reps) * 1e3
            print(f"{name:14s} {ms:8.2f} ms  ({ms / n * 1e6:.1f} ns/row)",
                  flush=True)
        except Exception as e:  # noqa: BLE001 - probe script, report and move on
            print(f"{name:14s} FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
