"""Pinhole camera and primary-ray generation.

Equivalent of the ``rayGenerator`` kernel (reference: renderer/Shaders.metal:75-103):
camera at ``up - view*2.35`` = (0, 1, 2.35) looking down -z, 90-degree horizontal
FOV, aspect-corrected, with an AA jitter of +-1/(dim-1) in normalized coords.
The reference's optional turntable parameter ``t`` (hardcoded 0.0,
reference: renderer/Shaders.metal:84) is exposed as a field.

Image convention: arrays are (H, W, ...) with row 0 at the *top* of the image
(matching EXR/PNG row order).  The reference indexes rows bottom-up in its
texture (Metal sample coords put texture row 0 at screen bottom;
reference: renderer/Renderer.mm:227-240 flips the golden EXR to the same
convention), so the row coordinate here is ``H-1-row`` relative to the
reference's ``threadId.y``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.math3d import normalize


class Camera(NamedTuple):
    t: jnp.ndarray  # turntable angle, 0.0 in the reference

    @staticmethod
    def reference_default() -> "Camera":
        return Camera(t=jnp.float32(0.0))


def generate_rays(camera: Camera, height: int, width: int, jitter: jnp.ndarray):
    """Build primary rays for every pixel.

    Args:
      camera: the (turntable) camera.
      height, width: render resolution.
      jitter: (H, W, 2) uniforms in [0, 1) used for the AA jitter (the
        reference's noiseSample.xy, renderer/Shaders.metal:91-92).

    Returns:
      origins (H, W, 3), directions (H, W, 3), both float32.
    """
    aspect = jnp.float32(height) / jnp.float32(width)

    ct, st = jnp.cos(camera.t), jnp.sin(camera.t)
    side = jnp.stack([ct, jnp.float32(0.0), st])
    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    view = jnp.stack([st, jnp.float32(0.0), -ct])

    x = jnp.arange(width, dtype=jnp.float32)[None, :]          # column, left -> right
    row = jnp.arange(height, dtype=jnp.float32)[:, None]
    y = jnp.float32(height - 1) - row                          # reference counts rows bottom-up

    dudv = (jitter * 2.0 - 1.0) / jnp.array(
        [width - 1, height - 1], jnp.float32
    )  # (H, W, 2)
    ncx = 2.0 * x / jnp.float32(width - 1) - 1.0               # (1, W)
    ncy = 2.0 * y / jnp.float32(height - 1) - 1.0              # (H, 1)

    dx = dudv[..., 0] + ncx
    dy = dudv[..., 1] + ncy * aspect
    directions = (
        side * dx[..., None] + up * dy[..., None] + view
    )
    directions = normalize(directions)
    origin = up - view * 2.35
    origins = jnp.broadcast_to(origin, directions.shape)
    return origins, directions
