"""Compile-time of variadic lax.sort vs operand count at production size.

The TPU backend's multi-operand sort lowering is super-linear in operand
count (measured: 11 planes 106 s, 18 planes 248 s at N=262k); this probe
picks the largest payload that compiles in tolerable time at N=1920*1080.
"""
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/tests/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 1920 * 1080
key = jax.random.PRNGKey(0)
k = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.int32)
pix = jax.random.randint(key, (N,), 0, N, dtype=jnp.uint32)

for nplanes in [int(a) for a in (sys.argv[1:] or [18, 20, 22, 24])]:
    planes = [jax.random.uniform(jax.random.fold_in(key, i), (N,))
              for i in range(nplanes - 2)]
    f = jax.jit(lambda k_, p_, p: jax.lax.sort((k_, p_, *p), num_keys=2))
    t0 = time.time()
    c = f.lower(k, pix, planes).compile()
    tc = time.time() - t0
    out = f(k, pix, planes)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = f(k, pix, planes)
        jax.block_until_ready(out)
        ts.append(time.time() - t0)
    print(f"operands={nplanes}: compile {tc:7.1f}s  run {min(ts)*1e3:7.2f} ms",
          flush=True)
