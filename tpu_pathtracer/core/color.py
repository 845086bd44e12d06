"""Color transfer functions and tonemapping.

Reference: renderer/Raytracing.h:125-135 (sRGB), renderer/Shaders.metal:43-51
(display-path tonemap + manual sRGB).
"""

from __future__ import annotations

import jax.numpy as jnp


def to_linear(value: jnp.ndarray) -> jnp.ndarray:
    """sRGB -> linear (reference: renderer/Raytracing.h:125-128)."""
    return jnp.where(
        value < 0.04045,
        value / 12.92,
        jnp.power(jnp.maximum((value + 0.055) / 1.055, 0.0), 2.4),
    )


def to_srgb(value: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB with [0,1] clamp (reference: renderer/Raytracing.h:130-135)."""
    v = jnp.clip(value, 0.0, 1.0)
    return jnp.where(v < 0.0031308, 12.92 * v, 1.055 * jnp.power(v, 1.0 / 2.4) - 0.055)


def tonemap_exposure(color: jnp.ndarray) -> jnp.ndarray:
    """1 - exp(-c) exposure tonemap (reference: renderer/Shaders.metal:43-45)."""
    return 1.0 - jnp.exp(-color)
