"""Multi-host meshes: tiles over DCN, samples over ICI, gather at the edge.

SURVEY.md §5 names the communication layering for scaling past one host:
row-tiles are embarrassingly parallel (no hot-loop traffic), so the 'tiles'
mesh axis is laid out ACROSS processes — the only data that ever crosses the
data-center network is the final image gather at display/save time.  The
'spp' axis (the one per-frame ``psum``) is laid out WITHIN each process, so
the collective rides ICI between a host's own chips.

Everything here degrades gracefully to a single process: ``make_multihost_mesh``
is then just ``make_mesh`` over the local devices, and ``gather_image`` a
device fetch — which is how CI exercises it on the virtual CPU mesh.
"""

from __future__ import annotations

import jax
import numpy as np

from ..render.state import RenderState
from .tiles import make_mesh


def make_multihost_mesh(n_spp: int = 1, devices=None):
    """('tiles', 'spp') mesh whose 'tiles' axis spans processes.

    Device order: process-major (``jax.devices()`` already enumerates every
    process's chips grouped by process id), so reshaping to
    (n_tiles, n_spp) puts each process's ``local_device_count`` chips on
    contiguous tile rows and keeps every 'spp' group (the psum participants)
    within one process — the collective stays on ICI, never DCN.
    """
    devices = list(devices if devices is not None else jax.devices())
    local = max(
        len([d for d in devices if d.process_index == p])
        for p in {d.process_index for d in devices}
    )
    if n_spp > 1 and local % n_spp:
        raise ValueError(
            f"n_spp={n_spp} must divide the per-process device count "
            f"({local}) so the sample psum stays on ICI; "
            "use a smaller n_spp or shard samples across hosts explicitly"
        )
    return make_mesh(len(devices) // n_spp, n_spp, devices=devices)


def gather_image(state: RenderState) -> np.ndarray:
    """Fetch the full (H, W, S) accumulator to THIS host.

    Single process (CI, one-host TPU): a plain device fetch.  Multi-host:
    each process only holds its addressable row-tiles, so the full image is
    assembled over DCN with a process allgather — the one cross-host
    transfer in the system, at display/save frequency, matching SURVEY §5's
    "DCN only for multi-host image gather".
    """
    if jax.process_count() == 1:
        return np.asarray(state.accum)
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(state.accum, tiled=True)
    )
