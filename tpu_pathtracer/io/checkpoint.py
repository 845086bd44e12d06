"""Checkpoint/resume of progressive render state.

The reference has no checkpointing: its progressive state is a GPU texture plus
a host counter, silently reset on resize (reference: renderer/Renderer.mm:654).
Here (accum, frame_index, key) is an explicit pytree saved to a single .npz.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..render.state import RenderState

_FORMAT_VERSION = 1


def save_checkpoint(path: str, state: RenderState) -> None:
    np.savez_compressed(
        path,
        version=_FORMAT_VERSION,
        accum=np.asarray(state.accum),
        frame_index=np.asarray(state.frame_index),
        key_data=np.asarray(jax.random.key_data(state.key)),
    )


def load_checkpoint(path: str) -> RenderState:
    with np.load(path) as data:
        version = int(data["version"])
        if version != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {version}")
        key = jax.random.wrap_key_data(jnp.asarray(data["key_data"]))
        return RenderState(
            accum=jnp.asarray(data["accum"]),
            frame_index=jnp.asarray(data["frame_index"]),
            key=key,
        )
