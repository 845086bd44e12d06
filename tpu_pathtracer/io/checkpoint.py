"""Checkpoint/resume of progressive render state.

The reference has no checkpointing: its progressive state is a GPU texture plus
a host counter, silently reset on resize (reference: renderer/Renderer.mm:654).
Here (accum, frame_index, key) is an explicit pytree with two storage
backends:

* ``npz`` (default) — one compressed .npz file, host-gathered.  Right for
  single-host use and small/medium accumulators.
* ``orbax`` — an Orbax checkpoint directory.  Arrays are written per-shard
  without a host gather, so very large or multi-host-sharded accumulators
  (parallel/multihost.py) checkpoint at device speed.  Restore materializes
  host arrays (no abstract target is passed); ``Renderer.load_checkpoint``
  re-shards the restored state onto the live mesh afterwards.  Chosen
  automatically when ``path`` has no ``.npz`` suffix, or explicitly via
  ``backend=``.

Both backends save via a temp name and swap, so a crash mid-save cannot
destroy the previous checkpoint.
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
    # Write-then-replace: a crash mid-save must not truncate the previous
    # checkpoint.  The ".npz"-suffixed temp name also sidesteps
    # np.savez_compressed's silent suffix append, so the final file is
    # exactly ``path`` whatever its extension.
    tmp = path + ".tmp.npz"
    np.savez_compressed(
        tmp,
        version=_FORMAT_VERSION,
        accum=np.asarray(state.accum),
        frame_index=np.asarray(state.frame_index),
        key_data=np.asarray(jax.random.key_data(state.key)),
    )
    os.replace(tmp, path)


def load_checkpoint(path: str, backend: str | None = None) -> RenderState:
    if _pick_backend(path, backend) == "orbax":
        return _load_orbax(path)
    with np.load(path) as data:
        version = int(data["version"])
        if version != _FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {version}")
        return RenderState(
            accum=jnp.asarray(data["accum"]),
            frame_index=jnp.asarray(data["frame_index"]),
            key=_restore_key(data["key_data"]),
        )


def _restore_key(key_data) -> jnp.ndarray:
    """Raw uint32 key matching init_state's jax.random.PRNGKey form, so the
    resumed pytree has the SAME leaf dtype as a fresh one and the jitted
    frame step's compile cache still hits (a typed wrap_key_data key would
    force a full retrace on the first resumed frame)."""
    return jnp.asarray(key_data, jnp.uint32)


def _as_tree(state: RenderState) -> dict:
    # typed PRNG keys are not serializable array leaves; ship the raw counter
    return {
        "version": jnp.int32(_FORMAT_VERSION),
        "accum": state.accum,
        "frame_index": state.frame_index,
        "key_data": jax.random.key_data(state.key),
    }


def _save_orbax(path: str, state: RenderState) -> None:
    import shutil

    import orbax.checkpoint as ocp

    # save to a sibling temp dir and swap, so the previous checkpoint
    # survives a crash mid-save (force=True would delete it up front)
    path = os.path.abspath(path)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp, _as_tree(state))
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)


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
        key=_restore_key(tree["key_data"]),
    )
