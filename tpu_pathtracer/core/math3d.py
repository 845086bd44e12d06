"""Small 3-vector helpers over ``(..., 3)`` arrays.

Everything operates on stacked SoA-style arrays so the whole wavefront of rays is
one vector op on the VPU — there is no per-ray scalar code anywhere in the
framework.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched dot product over the last axis; keeps no dims."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.sum(a * a, axis=-1))


def normalize(a: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    n2 = jnp.sum(a * a, axis=-1, keepdims=True)
    if eps:
        n2 = jnp.maximum(n2, eps)
    return a * jax.lax.rsqrt(n2)


def reflect(i: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Metal-style reflect: i - 2*dot(n, i)*n (i points toward the surface)."""
    return i - 2.0 * dot(n, i)[..., None] * n
