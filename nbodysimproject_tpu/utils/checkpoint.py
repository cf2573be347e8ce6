"""Checkpoint / resume for simulation state.

Parity: the reference only has in-memory snapshot dicts
(simulation.py:324-484; SURVEY.md section 5 — "no file format").  The
TPU build's state is a flat PyTree, so durable checkpointing comes for
free: orbax when available, a NumPy .npz archive otherwise.  Batched
states (leading B axis) checkpoint identically.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import SimState, DynParams


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(path: str, states: SimState, dyns: DynParams,
                    meta: dict | None = None) -> None:
    """Write (states, dyns, meta) durably.  ``path`` gets ``.npz``."""
    payload = {}
    for prefix, tree in (("state", states), ("dyn", dyns)):
        leaves, _ = _flatten(tree)
        names = _field_names(tree)
        for name, leaf in zip(names, leaves):
            payload[f"{prefix}.{name}"] = np.asarray(leaf)
    payload["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8)
    np.savez(path if path.endswith(".npz") else path + ".npz", **payload)


def load_checkpoint(path: str, dtype=None):
    """Return (states, dyns, meta)."""
    if not path.endswith(".npz") and not os.path.exists(path):
        path = path + ".npz"
    with np.load(path) as z:
        meta = json.loads(bytes(z["__meta__"]).decode()) if "__meta__" in z else {}

        def build(cls, prefix):
            kwargs = {}
            for name in _dataclass_fields(cls):
                arr = z[f"{prefix}.{name}"]
                j = jnp.asarray(arr)
                if dtype is not None and jnp.issubdtype(j.dtype, jnp.floating):
                    j = j.astype(dtype)
                kwargs[name] = j
            return cls(**kwargs)

        return build(SimState, "state"), build(DynParams, "dyn"), meta


def save_checkpoint_orbax(path: str, states, dyns, meta=None) -> None:
    """orbax-backed checkpoint (for multi-host / async use-cases)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.abspath(path),
               {"states": states, "dyns": dyns, "meta": meta or {}},
               force=True)


def load_checkpoint_orbax(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    out = ckptr.restore(os.path.abspath(path))
    st = SimState(**out["states"]) if isinstance(out["states"], dict) \
        else out["states"]
    dy = DynParams(**out["dyns"]) if isinstance(out["dyns"], dict) \
        else out["dyns"]
    return st, dy, out.get("meta", {})


def _dataclass_fields(cls):
    import dataclasses

    return [f.name for f in dataclasses.fields(cls)]


def _field_names(tree):
    return _dataclass_fields(type(tree))
