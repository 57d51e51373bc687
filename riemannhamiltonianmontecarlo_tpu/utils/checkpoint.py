"""Checkpoint / resume for chain states.

The reference only write-dumps posterior samples at the end of a run
(``BLR_RMHMC.m:406``, ``ODE_RMHMC.m:550-556``) with no resume.  Here any
kernel state pytree (positions, cached geometry, adaptation state, PRNG
key) round-trips through a single ``.npz`` file, so long sampling runs
can stop and resume bit-exactly (SURVEY.md section 5, checkpoint/resume).

Restore needs a template pytree with the same structure (the usual JAX
convention -- build the kernel state for the right shapes, then load
into it).  Multi-host runs save per-process shards
(``path.{process_index}``) of the locally-addressable chain slice.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def save_state(path: str | Path, state: Any, *, step: int = 0, key=None) -> None:
    """Serialize a kernel-state pytree (+ iteration counter, PRNG key)."""
    leaves = jax.tree.leaves(state)
    payload = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    payload["__step__"] = np.asarray(step, np.int64)
    if key is not None:
        payload["__key__"] = np.asarray(jax.random.key_data(key))
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    tmp.replace(path)  # atomic publish


def load_state(path: str | Path, like: Any):
    """Restore a state saved by :func:`save_state`.

    ``like`` is a template pytree with the target structure/shapes.
    Returns (state, step, key_or_None).
    """
    with np.load(path) as data:
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
