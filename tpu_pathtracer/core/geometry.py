"""Vertex interpolation and triangle geometry helpers (component-major).

Reference: renderer/KernelHelpers.h:23-47 (interpolate) and the light-table area
math in renderer/Renderer.mm:408.
"""

from __future__ import annotations

import jax.numpy as jnp

from .math3d import cross, length, normalize


def interpolate(p0, p1, p2, n0, n1, n2, uvw):
    """Barycentric position/normal interpolation; the normal is re-normalized
    (reference: renderer/KernelHelpers.h:23-37).

    ``p*``/``n*``: (3, N) vertex positions/normals; ``uvw``: (3, N) weights.
    Returns (position (3, N), normal (3, N)).
    """
    w0, w1, w2 = uvw[0][None], uvw[1][None], uvw[2][None]
    pos = p0 * w0 + p1 * w1 + p2 * w2
    nrm = normalize(n0 * w0 + n1 * w1 + n2 * w2)
    return pos, nrm


def triangle_area(p0, p1, p2):
    """0.5 * |cross(p1-p0, p2-p0)| (reference: renderer/Renderer.mm:408)."""
    return 0.5 * length(cross(p1 - p0, p2 - p0))
