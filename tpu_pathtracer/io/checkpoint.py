"""Checkpoint/resume of progressive render state.

The reference has no checkpointing: its progressive state is a GPU texture plus
a host counter, silently reset on resize (reference: renderer/Renderer.mm:654).
Here (accum, frame_index, key) is an explicit pytree with two storage
backends:

* ``npz`` (default) — one compressed .npz file, host-gathered.  Right for
  single-host use and small/medium accumulators.
* ``orbax`` — an Orbax checkpoint directory.  Arrays are written per-shard
  without a host gather, so very large or multi-host-sharded accumulators
  (parallel/multihost.py) checkpoint at device speed; restore places shards
  by the live mesh.  Chosen automatically when ``path`` has no ``.npz``
  suffix, or explicitly via ``backend=``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..render.state import RenderState

_FORMAT_VERSION = 1


def _pick_backend(path: str, backend: str | None) -> str:
    if backend in ("npz", "orbax"):
        return backend
    if backend is not None:
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    return "npz" if path.endswith(".npz") else "orbax"


def save_checkpoint(path: str, state: RenderState,
                    backend: str | None = None) -> None:
    if _pick_backend(path, backend) == "orbax":
        return _save_orbax(path, state)
    np.savez_compressed(
        path,
        version=_FORMAT_VERSION,
        accum=np.asarray(state.accum),
        frame_index=np.asarray(state.frame_index),
        key_data=np.asarray(jax.random.key_data(state.key)),
    )


def load_checkpoint(path: str, backend: str | None = None) -> RenderState:
    if _pick_backend(path, backend) == "orbax":
        return _load_orbax(path)
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


def _as_tree(state: RenderState) -> dict:
    # typed PRNG keys are not serializable array leaves; ship the raw counter
    return {
        "version": jnp.int32(_FORMAT_VERSION),
        "accum": state.accum,
        "frame_index": state.frame_index,
        "key_data": jax.random.key_data(state.key),
    }


def _save_orbax(path: str, state: RenderState) -> None:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), _as_tree(state), force=True)


def _load_orbax(path: str) -> RenderState:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(os.path.abspath(path))
    version = int(np.asarray(tree["version"]))
    if version != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {version}")
    return RenderState(
        accum=jnp.asarray(tree["accum"]),
        frame_index=jnp.asarray(tree["frame_index"]),
        key=jax.random.wrap_key_data(jnp.asarray(tree["key_data"])),
    )
