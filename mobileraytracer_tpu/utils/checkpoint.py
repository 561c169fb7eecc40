"""Checkpoint / resume for progressive renders and optimization runs.

The reference has none (an explicitly open TODO, docs/FEATURES.md:142-144);
its only resumable state is the progressive bitmap plus the sample cursor
(Renderer.cpp:151, 177-179).  Here the full render state —
(accumulation buffer float32, sample index, RNG seed, config fingerprint)
plus optional differentiable parameters and optimizer state — persists as
a single .npz so a render or a material-recovery loop can resume mid-SPP
on any host count (per-(pixel, sample) RNG keys make the continuation
bitwise identical to an uninterrupted run).
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..types import RenderConfig


def save_render_state(path: str, accum: jnp.ndarray, sample: int,
                      total_rays: int, config: RenderConfig,
                      extra: Optional[dict] = None) -> None:
    payload = {
        "accum": np.asarray(accum),
        "sample": np.asarray(sample, np.int64),
        "total_rays": np.asarray(total_rays, np.int64),
        "config_json": np.frombuffer(
            json.dumps(dataclasses.asdict(config)).encode(), dtype=np.uint8),
    }
    if extra:
        for k, v in extra.items():
            payload[f"extra_{k}"] = np.asarray(v)
    np.savez(path, **payload)


def load_render_state(path: str) -> Tuple[jnp.ndarray, int, int,
                                          RenderConfig, dict]:
    data = np.load(path)
    cfg_dict = json.loads(bytes(data["config_json"]).decode())
    config = RenderConfig(**cfg_dict)
    extra = {k[len("extra_"):]: data[k] for k in data.files
             if k.startswith("extra_")}
    return (jnp.asarray(data["accum"]), int(data["sample"]),
            int(data["total_rays"]), config, extra)


def save_opt_state(path: str, state, step: int, losses) -> None:
    """Persists an optimization state pytree (params + optax state) plus
    the step cursor and loss history as one .npz."""
    leaves = jax.tree_util.tree_leaves(state)
    payload = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    payload["opt_step"] = np.asarray(step, np.int64)
    payload["losses"] = np.asarray(losses, np.float64)
    np.savez(path, **payload)


def load_opt_state(path: str, template):
    """Restores a state saved by save_opt_state; `template` provides the
    pytree structure (a freshly-initialized state).  Returns
    (state, step, losses) or None when no checkpoint exists."""
    import os
    if not os.path.exists(path):
        return None
    data = np.load(path)
    treedef = jax.tree_util.tree_structure(template)
    n = treedef.num_leaves
    leaves = [jnp.asarray(data[f"leaf_{i}"]) for i in range(n)]
    state = jax.tree_util.tree_unflatten(treedef, leaves)
    return state, int(data["opt_step"]), list(data["losses"])
