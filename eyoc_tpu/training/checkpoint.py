"""Checkpoint save / resume.

Parity with the reference checkpoint contract (reference
lib/trainer.py:108-125, 166-179): `{epoch, state_dict(params+bn), optimizer,
scheduler(epoch-derived), config, best_val, best_val_epoch, best_val_metric}`
saved as `checkpoint` / `best_val_checkpoint`; `--resume` restores
everything, `--finetune_restart` restores weights only, labeler weights
loadable from a separate run (`--labeler_dir/--labeler_weight`,
lib/trainer.py:817-842).

Serialization: flax msgpack for pytrees + a JSON sidecar for metadata.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


def save_checkpoint(out_dir: str, name: str, *, epoch: int, state,
                    config: Dict[str, Any], best_val: float,
                    best_val_epoch: int, best_val_metric: str):
    os.makedirs(out_dir, exist_ok=True)
    payload = {
        "params": _to_numpy(state.params),
        "bn_state": _to_numpy(state.bn_state),
        "opt": _to_numpy(state.opt),
        "labeler_params": _to_numpy(state.labeler_params),
        "labeler_bn_state": _to_numpy(state.labeler_bn_state),
        "num_updates": int(state.num_updates),
        "key": np.asarray(jax.random.key_data(state.key)),
    }
    path = os.path.join(out_dir, f"{name}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    meta = {
        "epoch": int(epoch),
        "best_val": float(best_val),
        "best_val_epoch": int(best_val_epoch) if np.isfinite(best_val_epoch) else -1,
        "best_val_metric": best_val_metric,
        "config": dict(config),
    }
    with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
        json.dump(meta, f, indent=2)
    return path


def load_checkpoint(path_base: str, template_state) -> Tuple[Any, Dict[str, Any]]:
    """path_base: path without extension (e.g. <dir>/checkpoint).

    Returns (state, meta). `template_state` supplies the pytree structure.
    """
    with open(path_base + ".msgpack", "rb") as f:
        raw = f.read()
    target = {
        "params": _to_numpy(template_state.params),
        "bn_state": _to_numpy(template_state.bn_state),
        "opt": _to_numpy(template_state.opt),
        "labeler_params": _to_numpy(template_state.labeler_params),
        "labeler_bn_state": _to_numpy(template_state.labeler_bn_state),
        "num_updates": 0,
        "key": np.asarray(jax.random.key_data(template_state.key)),
    }
    payload = serialization.from_bytes(target, raw)
    import jax.numpy as jnp

    state = template_state._replace(
        params=jax.tree_util.tree_map(jnp.asarray, payload["params"]),
        bn_state=jax.tree_util.tree_map(jnp.asarray, payload["bn_state"]),
        opt=jax.tree_util.tree_map(jnp.asarray, payload["opt"]),
        labeler_params=jax.tree_util.tree_map(jnp.asarray, payload["labeler_params"]),
        labeler_bn_state=jax.tree_util.tree_map(jnp.asarray, payload["labeler_bn_state"]),
        num_updates=jnp.int32(payload["num_updates"]),
        key=jax.random.wrap_key_data(jnp.asarray(payload["key"])),
    )
    meta_path = path_base + ".json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def load_weights_only(path_base: str, template_params, template_bn):
    """--finetune_restart / labeler loading: weights + BN stats only."""
    with open(path_base + ".msgpack", "rb") as f:
        raw = f.read()
    partial = serialization.msgpack_restore(raw)
    import jax.numpy as jnp

    params = serialization.from_state_dict(_to_numpy(template_params), partial["params"])
    bn = serialization.from_state_dict(_to_numpy(template_bn), partial["bn_state"])
    return (
        jax.tree_util.tree_map(jnp.asarray, params),
        jax.tree_util.tree_map(jnp.asarray, bn),
    )
