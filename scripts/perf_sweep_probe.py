"""Price the primitives for a leaf-sweep + dense-MT pipeline before building it.

Pipeline sketch (for incoherent bounces):
  1. Pallas box-sweep: every lane tests every leaf-bin AABB -> per-lane hit
     bitmask planes (no tree walk at all; scenes are <=7k tris).
  2. Expand bitmask -> K candidate-bin slots per lane (XLA bit tricks).
  3. One global sort of (bin, slot) pairs with ray payload -> dense per-bin
     segments.
  4. Pallas dense-MT over the sorted pairs (min-walk over bin segments at
     ~full lane utilization).
  5. Scatter/sort results back; per-lane min over K slots.

This probe measures each primitive's cost on the chip so the design can be
accepted/rejected on numbers.
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

N = 1920 * 1080  # ~2.07M


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., ::4097]))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., ::4097]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    key = jax.random.PRNGKey(0)

    # --- 1. lax.sort costs at pair scale -------------------------------
    for m, planes in [(N, 2), (N, 8), (4 * N, 2), (4 * N, 8), (8 * N, 2), (8 * N, 8)]:
        keys = jax.random.randint(key, (m,), 0, 448, dtype=jnp.int32)
        pay = [jax.random.uniform(jax.random.fold_in(key, i), (m,))
               for i in range(planes - 1)]

        f = jax.jit(lambda k, p: jax.lax.sort((k, *p), num_keys=1))
        t = timeit(f, keys, pay)
        print(f"sort   m={m/1e6:5.1f}M planes={planes}: {t*1e3:8.2f} ms", flush=True)

    # --- 2. XLA row gather at pair scale -------------------------------
    tbl = jax.random.uniform(key, (N, 8))
    for m in (N, 4 * N, 8 * N):
        idx = jax.random.randint(key, (m,), 0, N, dtype=jnp.int32)
        f = jax.jit(lambda t_, i: jnp.take(t_, i, axis=0))
        t = timeit(f, tbl, idx)
        print(f"gather m={m/1e6:5.1f}M rows of 8 f32: {t*1e3:8.2f} ms", flush=True)

    # --- 3. k-th-set-bit extraction from 14 bitmask planes -------------
    K = 12
    masks = jax.random.randint(key, (14, N), 0, 2**31 - 1, dtype=jnp.int32)

    def extract(masks):
        # slot k = bin index of the k-th set bit across the 448-bit field
        outs = []
        cnt = jnp.zeros((N,), jnp.int32)
        found = [jnp.full((N,), 2**30, jnp.int32) for _ in range(K)]
        for p in range(14):
            mp = masks[p]
            for b in range(32):
                bit = (mp >> b) & 1
                idx = p * 32 + b
                for k in range(K):
                    hit_k = (bit == 1) & (cnt == k)
                    found[k] = jnp.where(hit_k, idx, found[k])
                cnt = cnt + bit
        return jnp.stack(found)

    t = timeit(jax.jit(extract), masks)
    print(f"extract K={K} from 448-bit masks (naive): {t*1e3:8.2f} ms", flush=True)

    # --- 4. scatter results back by slot id ----------------------------
    m = 4 * N
    vals = jax.random.uniform(key, (m,))
    slots = jax.random.permutation(key, m).astype(jnp.int32)
    f = jax.jit(lambda v, s: jnp.zeros((m,), jnp.float32).at[s].set(v))
    t = timeit(f, vals, slots)
    print(f"scatter m={m/1e6:.1f}M f32 by permutation: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
