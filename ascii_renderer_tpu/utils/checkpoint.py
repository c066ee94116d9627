"""Checkpoint / resume (SURVEY §5).

The reference's nearest analog is content persistence: the JSON-able
unified scene schema (scene_api.js:195-236 + fromObject) and raw atlas IO
(atlas_paint.py:88-105). Here EVERY piece of runtime state is a pytree, so
checkpointing is generic:

  - `save_pytree` / `load_pytree`: flat .npz with slash-joined key paths —
    zero dependencies, deterministic, diffable; PRNG keys round-trip via
    key_data/wrap_key_data;
  - `save_orbax` / `load_orbax`: orbax-checkpoint for production trees
    (optimizer states, sharded params);
  - scene JSON round trip via the builder's to_unified/from_object.

Deterministic resume is free: the path tracer's RNG is counter-based
(keys derived from frame/batch indices), so state + indices fully replay.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

_KEY_PREFIX = "__prngkey__/"


def _is_key(leaf) -> bool:
    return hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key)


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "name", getattr(p, "idx", p)))
                    for p in path)


def save_pytree(path: str, tree: Any) -> None:
    """Save any pytree of arrays as a flat .npz (keys = tree paths)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = {}
    for p, leaf in flat:
        k = _path_str(p)
        if _is_key(leaf):
            out[_KEY_PREFIX + k] = np.asarray(jax.random.key_data(leaf))
        else:
            out[k] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez_compressed(path, **out)


def load_pytree(path: str, like: Any) -> Any:
    """Load a pytree saved by save_pytree; ``like`` provides the structure
    (and the PRNG key impl for key leaves)."""
    with np.load(path) as z:
        data = dict(z)
    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, leaf in flat:
        k = _path_str(p)
        if _is_key(leaf):
            leaves.append(jax.random.wrap_key_data(
                jnp.asarray(data[_KEY_PREFIX + k])))
        elif k in data:
            leaves.append(jnp.asarray(data[k]))
        else:
            raise ValueError(f"checkpoint missing key: {k}")
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_scene_json(path: str, builder) -> None:
    """Persist a SceneBuilder as unified-schema JSON (the reference's
    serialization capability)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(builder.to_unified(), f, indent=1)


def load_scene_json(path: str):
    from ascii_renderer_tpu.scene.builder import from_object
    with open(path) as f:
        return from_object(json.load(f))


def save_orbax(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), like)
