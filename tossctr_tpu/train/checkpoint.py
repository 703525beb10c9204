"""Checkpointing.

Fold checkpoints preserve the reference's contract (SURVEY.md §5): each
is self-describing (carries the config), and bundles model params, EMA
shadows, the fitted calibrator, best score/epoch and global step
(reference train.py:265-273,347).  Layout (a directory per fold instead
of a torch pickle):

    runs/<exp>/ckpt_folds_<f>/
      meta.json        # score, best_score, epoch, global_step, cfg
      params.msgpack   # flax-serialized model params
      ema.msgpack      # EMA shadow pytree (optional)
      calibrator.pkl   # pickled eval.calibration.Calibrator (optional)

Fold-skip resume (train.py:343-345) keys on the directory's existence.

``save_train_state``/``load_train_state`` additionally provide
step-granularity resume (params + opt_state + EMA + step + sampler
epoch) that the reference lacks — required for long multi-host runs
(SURVEY.md §5 failure detection).
"""

from __future__ import annotations

import json
import os
import pickle
import shutil
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization

from .sharded_ckpt import (
    _is_row_sharded,
    is_sharded_checkpoint,
    load_sharded_pytree,
    save_sharded_pytree,
)


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


def _has_row_sharded(tree) -> bool:
    return any(_is_row_sharded(x) for x in jax.tree_util.tree_leaves(tree))


def save_pytree(path: str, tree: Any) -> None:
    state = serialization.to_state_dict(_to_host(tree))
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(state))


_NORM_RENAMES = {
    "RMSNorm_0": "norm1", "RMSNorm_1": "norm2",
    "LayerNorm_0": "norm1", "LayerNorm_1": "norm2",
}


def _migrate_norm_names(state):
    """Round-2 migration: encoder-layer norms gained explicit names
    (norm1/norm2 instead of flax auto RMSNorm_0/RMSNorm_1) so the fused
    block-tail kernel path could share the param tree.  Rename ONLY
    inside scopes that also contain an 'mha' sibling (the encoder
    layers) — QNN's pre-norm keeps its auto name."""
    if not isinstance(state, dict):
        return state
    out = {}
    is_layer = "mha" in state
    for k, v in state.items():
        nk = _NORM_RENAMES.get(k, k) if is_layer else k
        out[nk] = _migrate_norm_names(v)
    return out


def load_pytree(path: str, target: Any = None) -> Any:
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    state = _migrate_norm_names(state)
    if target is not None:
        return serialization.from_state_dict(target, state)
    return state


def fold_ckpt_dir(exp_dir: str, fold: int) -> str:
    return os.path.join(exp_dir, f"ckpt_folds_{fold}")


def fold_ckpt_exists(exp_dir: str, fold: int) -> bool:
    return os.path.exists(os.path.join(fold_ckpt_dir(exp_dir, fold), "meta.json"))


def save_fold_checkpoint(
    exp_dir: str,
    fold: int,
    *,
    params: Any,
    cfg_dict: Dict,
    best_score: float,
    epoch: int,
    global_step: int,
    ema_shadow: Any = None,
    calibrator: Any = None,
    complete: bool = True,
) -> str:
    """``complete=False`` writes the payload but not meta.json — used for
    in-progress best-so-far saves under step checkpointing; meta.json's
    presence is the completeness marker that fold-skip resume keys on."""
    d = fold_ckpt_dir(exp_dir, fold)
    os.makedirs(d, exist_ok=True)
    # Pod-scale path (VERDICT r2 #4a): row-sharded params stream out one
    # device-shard file at a time — no full-table host pull, ever.
    def _save(tree, name):
        legacy, sharded = os.path.join(d, f"{name}.msgpack"), os.path.join(d, name)
        if _has_row_sharded(tree):
            save_sharded_pytree(sharded, tree)
            if os.path.exists(legacy):
                os.remove(legacy)
        else:
            save_pytree(legacy, tree)
            if os.path.isdir(sharded):
                shutil.rmtree(sharded)

    _save(params, "params")
    if ema_shadow is not None:
        _save(ema_shadow, "ema")
    if calibrator is not None:
        with open(os.path.join(d, "calibrator.pkl"), "wb") as f:
            pickle.dump(calibrator, f)
    if complete:
        finalize_fold_checkpoint(
            exp_dir, fold, cfg_dict=cfg_dict, best_score=best_score,
            epoch=epoch, global_step=global_step,
        )
    return d


def finalize_fold_checkpoint(
    exp_dir: str, fold: int, *, cfg_dict: Dict, best_score: float,
    epoch: int, global_step: int,
) -> None:
    d = fold_ckpt_dir(exp_dir, fold)
    meta = {
        "fold": fold,
        "score": float(best_score),
        "best_score": float(best_score),
        "epoch": int(epoch),
        "global_step": int(global_step),
        "cfg": cfg_dict,
    }
    # meta.json written last: its presence marks a complete checkpoint
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)


def load_fold_checkpoint(
    ckpt_dir: str, params_target: Any = None, shardings_fn=None
) -> Dict:
    """``shardings_fn(key, shape) -> NamedSharding`` (see
    ``parallel.sharding.registry_shardings_fn``) places sharded payload
    entries directly onto their devices at pod scale."""
    with open(os.path.join(ckpt_dir, "meta.json")) as f:
        meta = json.load(f)
    out = dict(meta)

    def _load(name, target):
        legacy = os.path.join(ckpt_dir, f"{name}.msgpack")
        if os.path.exists(legacy):
            return load_pytree(legacy, target)
        sharded = os.path.join(ckpt_dir, name)
        if is_sharded_checkpoint(sharded):
            return load_sharded_pytree(sharded, target, shardings_fn=shardings_fn)
        return None

    out["params"] = _load("params", params_target)
    assert out["params"] is not None, f"no params payload in {ckpt_dir}"
    out["ema"] = _load("ema", None)
    cal_path = os.path.join(ckpt_dir, "calibrator.pkl")
    if os.path.exists(cal_path):
        with open(cal_path, "rb") as f:
            out["calibrator"] = pickle.load(f)
    else:
        out["calibrator"] = None
    return out


def list_fold_checkpoints(exp_dir: str):
    """Sorted fold-checkpoint dirs (reference infer.py:28 glob)."""
    import glob as _glob

    dirs = sorted(_glob.glob(os.path.join(exp_dir, "ckpt_folds_*")))
    return [d for d in dirs if os.path.exists(os.path.join(d, "meta.json"))]


# ---- step-granularity train-state checkpoints (TPU addition) ----


def save_train_state(path: str, *, step_state: Dict[str, Any]) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if _has_row_sharded(step_state):
        # pod scale: stream row-sharded leaves shard-by-shard into a
        # directory next to the msgpack path (no full-table host pull)
        save_sharded_pytree(path + ".sharded", step_state)
        if os.path.exists(path):
            os.remove(path)
        return
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(
            serialization.msgpack_serialize(
                serialization.to_state_dict(_to_host(step_state))
            )
        )
    os.replace(tmp, path)
    if os.path.isdir(path + ".sharded"):
        shutil.rmtree(path + ".sharded")


def train_state_exists(path: str) -> bool:
    return os.path.exists(path) or is_sharded_checkpoint(path + ".sharded")


def load_train_state(
    path: str, target: Dict[str, Any], shardings: Any = None
) -> Dict[str, Any]:
    if not os.path.exists(path) and is_sharded_checkpoint(path + ".sharded"):
        return load_sharded_pytree(path + ".sharded", target, shardings=shardings)
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(target, state)
