"""Texture sampling: bilinear lookups over a stacked texture array.

A BASELINE config-4 extension.  The reference parses texcoords but discards
them (reference: renderer/Renderer.mm:365-369) and samples no textures.  Here
``usemtl`` materials with a ``map_Kd`` get a texture index; at shade time the
hit's interpolated uv bilinearly samples the material's texture and MODULATES
the material's base Kd (standard OBJ semantics: effective albedo =
Kd * texel).

Storage is one (K, TH, TW, 3) stack (textures host-resampled to a common size
at load), flattened for gathers — per-lane texture reads are XLA gathers, so
textured scenes pay ~4 gathers per bounce; the bench scenes are untextured and
pay nothing.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def resample_nearest(img: np.ndarray, th: int, tw: int) -> np.ndarray:
    """Host-side nearest-neighbor resample of (H, W, C) to (th, tw, C)."""
    h, w = img.shape[:2]
    ri = (np.arange(th) * h // th).clip(0, h - 1)
    ci = (np.arange(tw) * w // tw).clip(0, w - 1)
    return img[ri][:, ci]


def sample_bilinear(textures: jnp.ndarray, tex_idx: jnp.ndarray,
                    uv: jnp.ndarray) -> jnp.ndarray:
    """textures (K, TH, TW, 3), tex_idx (N,) int32 (-1 = none -> white),
    uv (2, N) with wrap addressing -> (3, N) texel colors.

    OBJ v-coordinate convention: v = 0 is the BOTTOM of the image (row TH-1).
    """
    k, th, tw, _ = textures.shape
    flat = textures.reshape(k * th * tw, 3)
    u = uv[0] - jnp.floor(uv[0])
    v = uv[1] - jnp.floor(uv[1])
    x = u * tw - 0.5
    y = (1.0 - v) * th - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    ti = jnp.maximum(tex_idx, 0)

    def read(xi, yi):
        xi = jnp.mod(xi.astype(jnp.int32), tw)
        yi = jnp.mod(yi.astype(jnp.int32), th)
        return jnp.take(flat, (ti * th + yi) * tw + xi, axis=0)  # (N, 3)

    c00 = read(x0, y0)
    c10 = read(x0 + 1, y0)
    c01 = read(x0, y0 + 1)
    c11 = read(x0 + 1, y0 + 1)
    top = c00 * (1.0 - fx)[:, None] + c10 * fx[:, None]
    bot = c01 * (1.0 - fx)[:, None] + c11 * fx[:, None]
    out = (top * (1.0 - fy)[:, None] + bot * fy[:, None]).T  # (3, N)
    return jnp.where(tex_idx[None, :] >= 0, out, 1.0)


def diffuse_modulation(scene, tri, u, v, mat, bins, samples: int) -> jnp.ndarray:
    """(S|C, N) spectral multiplier for the diffuse albedo at a hit:
    bilinear map_Kd texel upsampled to the render's spectral bins
    (1.0 wherever the material is untextured)."""
    from ..core import spectrum as spec
    from ..ops.tables import select_cols

    uvr = jnp.take(scene.tri_uv, tri, axis=1)                # (6, N)
    w0 = 1.0 - u - v
    uv = jnp.stack([
        uvr[0] * w0 + uvr[2] * u + uvr[4] * v,
        uvr[1] * w0 + uvr[3] * u + uvr[5] * v,
    ])
    tex_idx = select_cols(scene.mat_tex, mat)
    rgb = sample_bilinear(scene.textures, tex_idx, uv)       # (3, N)
    s = spec.from_rgb(rgb.T, samples).T                      # (S, N)
    return spec.apply_bins(s, bins)
