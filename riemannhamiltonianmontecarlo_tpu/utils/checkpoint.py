"""Checkpoint / resume for chain states.

The reference only write-dumps posterior samples at the end of a run
(``BLR_RMHMC.m:406``, ``ODE_RMHMC.m:550-556``) with no resume.  Here any
kernel state pytree (positions, cached geometry, adaptation state, PRNG
key) round-trips through a single ``.npz`` file, so long sampling runs
can stop and resume bit-exactly (SURVEY.md section 5, checkpoint/resume).

Restore needs a template pytree with the same structure (the usual JAX
convention -- build the kernel state for the right shapes, then load
into it).

Multi-process runs write per-process shard files (``<path>.p<k>`` for
process k): each process serializes only its locally-addressable slice
of every chain-axis-sharded leaf (reassembled from addressable shards in
index order) and restores from its own shard file, so no cross-host
gather is needed to checkpoint.  Periodic checkpointing of long runs is
``parallel.run_checkpointed``.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _shard_path(path: str | Path) -> Path:
    """Per-process shard file; the bare path in single-process runs."""
    path = Path(path)
    if jax.process_count() > 1:
        return path.with_name(path.name + f".p{jax.process_index()}")
    return path


def _local_numpy(leaf) -> np.ndarray:
    """Locally-addressable slice of a (possibly cross-process) jax.Array.

    Fully-addressable arrays convert directly.  For process-sharded
    arrays the addressable shards are stitched along their leading-axis
    index (the chain axis in this framework), skipping replicated
    duplicates.
    """
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        parts: dict[tuple, np.ndarray] = {}
        for s in leaf.addressable_shards:
            ix = tuple((sl.start, sl.stop) for sl in s.index)
            parts.setdefault(ix, np.asarray(s.data))
        ordered = [parts[k] for k in sorted(parts, key=lambda ix: ix[0][0] or 0)]
        return ordered[0] if len(ordered) == 1 else np.concatenate(ordered, axis=0)
    return np.asarray(leaf)


def save_state(path: str | Path, state: Any, *, step: int = 0, key=None) -> None:
    """Serialize a kernel-state pytree (+ iteration counter, PRNG key)."""
    leaves = jax.tree.leaves(state)
    payload = {f"leaf_{i}": _local_numpy(leaf) for i, leaf in enumerate(leaves)}
    payload["__step__"] = np.asarray(step, np.int64)
    if key is not None:
        payload["__key__"] = np.asarray(jax.random.key_data(key))
    path = _shard_path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    tmp.replace(path)  # atomic publish


def checkpoint_exists(path: str | Path) -> bool:
    return _shard_path(path).exists()


def load_state(path: str | Path, like: Any):
    """Restore a state saved by :func:`save_state`.

    ``like`` is a template pytree with the target structure/shapes
    (per-process local shapes in multi-process runs).  Returns
    (state, step, key_or_None).
    """
    with np.load(_shard_path(path)) as data:
        template_leaves, treedef = jax.tree.flatten(like)
        leaves = []
        for i, tmpl in enumerate(template_leaves):
            arr = data[f"leaf_{i}"]
            want = np.shape(tmpl)
            if tuple(arr.shape) != tuple(want):
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != template {want}"
                )
            leaves.append(jnp.asarray(arr, dtype=jnp.asarray(tmpl).dtype))
        step = int(data["__step__"])
        key = None
        if "__key__" in data:
            key = jax.random.wrap_key_data(jnp.asarray(data["__key__"]))
    return jax.tree.unflatten(treedef, leaves), step, key
