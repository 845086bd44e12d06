"""Pinhole camera and primary-ray generation.

Equivalent of the ``rayGenerator`` kernel (reference: renderer/Shaders.metal:75-103):
camera at ``up - view*2.35`` = (0, 1, 2.35) looking down -z, 90-degree horizontal
FOV, aspect-corrected, with an AA jitter of +-1/(dim-1) in normalized coords.
The reference's optional turntable parameter ``t`` (hardcoded 0.0,
reference: renderer/Shaders.metal:84) is exposed as a field.

Image convention: images are (H, W, ...) with row 0 at the *top* (EXR/PNG row
order); ray buffers are component-major (3, H*W) flattened row-major.  The
reference indexes rows bottom-up in its texture (Metal sample coords put
texture row 0 at screen bottom; reference: renderer/Renderer.mm:227-240 flips
the golden EXR to the same convention), so the row coordinate here is
``H-1-row`` relative to the reference's ``threadId.y``.
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


def generate_rays(
    camera: Camera,
    height: int,
    width: int,
    jitter: jnp.ndarray,
    row0=0,
    full_height: int | None = None,
    full_width: int | None = None,
):
    """Build primary rays for every pixel (or for one row-tile of the image).

    Args:
      camera: the (turntable) camera.
      height, width: tile resolution.
      jitter: (2, H*W) uniforms in [0, 1) for the AA jitter (the reference's
        noiseSample.xy, renderer/Shaders.metal:91-92).
      row0: absolute top row of this tile (for sharded rendering).
      full_height, full_width: full image resolution (defaults: the tile's).

    Returns:
      origins (3, H*W), directions (3, H*W), float32, row-major pixel order.
    """
    full_height = full_height or height
    full_width = full_width or width
    aspect = jnp.float32(full_height) / jnp.float32(full_width)

    ct, st = jnp.cos(camera.t), jnp.sin(camera.t)
    side = jnp.stack([ct, jnp.float32(0.0), st])          # (3,)
    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    view = jnp.stack([st, jnp.float32(0.0), -ct])

    x = jnp.arange(width, dtype=jnp.float32)[None, :]      # column, left -> right
    row = row0 + jnp.arange(height, dtype=jnp.float32)[:, None]
    y = jnp.float32(full_height - 1) - row                 # reference counts rows bottom-up

    du = (jitter[0] * 2.0 - 1.0) / jnp.float32(full_width - 1)
    dv = (jitter[1] * 2.0 - 1.0) / jnp.float32(full_height - 1)
    ncx = (2.0 * x / jnp.float32(full_width - 1) - 1.0)    # (1, W)
    ncy = (2.0 * y / jnp.float32(full_height - 1) - 1.0)   # (H, 1)

    dx = du + jnp.broadcast_to(ncx, (height, width)).reshape(-1)
    dy = dv + jnp.broadcast_to(ncy * aspect, (height, width)).reshape(-1)
    directions = (
        side[:, None] * dx[None, :] + up[:, None] * dy[None, :] + view[:, None]
    )
    directions = normalize(directions)
    origin = up - view * 2.35
    origins = jnp.broadcast_to(origin[:, None], directions.shape)
    return origins, directions
