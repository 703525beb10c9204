"""Inference: fold-checkpoint ensembling -> submission.csv
(reference: src/infer.py:10-173).

Per batch, every fold model runs a jitted forward — dispatched
asynchronously, with one device->host transfer for the whole dataset
(the reference syncs per batch per model, infer.py:109-116).
Per-model calibrators then map logits to probabilities on host;
probabilities are clamped to [1e-7, 1-1e-7]; a single model bypasses
ensembling; otherwise any of the mean/geom/logit/median/trim/rank_avg/
weighted/val_weighted methods combine the folds, batch-at-a-time so
rank_avg keeps the reference's within-batch ranking.  EMA shadows
stored in a checkpoint override the raw params (infer.py:88-93).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import numpy as np

from ..config import Config
from ..data.dataset import ShardCache
from ..data.loader import BatchIterator
from ..eval.metrics import ensemble_probs, val_weighted_weights
from ..models import CTRModel
from ..train.checkpoint import list_fold_checkpoints, load_fold_checkpoint
from ..train.trainer import build_model, make_eval_step


def _params_with_ema(ckpt: Dict):
    """EMA weights override raw params where present (reference
    infer.py:88-93).  The checkpoint's ``ema`` entry is the merged
    (mask-aware) weight tree with the same structure as ``params``."""
    if ckpt.get("ema") is not None:
        return ckpt["ema"]
    return ckpt["params"]


def load_fold_models(cfg: Config, dims: Dict[str, int], exp_dir: Optional[str] = None):
    """-> (model, [params_per_fold], [calibrator_per_fold], [score_per_fold])."""
    exp_dir = exp_dir or cfg.exp_dir()
    ckpt_dirs = list_fold_checkpoints(exp_dir)
    assert ckpt_dirs, f"No checkpoints found under {exp_dir}"
    model = build_model(cfg, dims)
    params_list, cals, scores = [], [], []
    for d in ckpt_dirs:
        ckpt = load_fold_checkpoint(d)
        params_list.append(_params_with_ema(ckpt))
        cals.append(ckpt.get("calibrator"))
        scores.append(float(ckpt.get("score", -1.0)))
    return model, params_list, cals, scores


def predict_ensemble(
    cfg: Config,
    cache: ShardCache,
    *,
    exp_dir: Optional[str] = None,
    batch_size: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """-> {'ids': (N,), 'probs': (N,)} over the full cache."""
    model, params_list, cals, scores = load_fold_models(cfg, cache.dims, exp_dir)
    eval_step = make_eval_step(model)
    bs = batch_size or cfg.train.batch_size

    ens = cfg.ensemble
    method = ens.method
    weights = None
    if method == "val_weighted":
        weights = val_weighted_weights(scores, ens.val_weight_temperature)
        method_use = "weighted"
    elif method == "weighted":
        assert len(ens.weights) == len(params_list), (
            "weights length must match #folds/models"
        )
        weights = np.asarray(ens.weights, np.float64)
        method_use = "weighted"
    else:
        method_use = method

    loader = BatchIterator(
        cache, batch_size=bs, train=False, shuffle=False, drop_last=False
    )
    # Phase 1 — device work, fully async: per batch, every fold model's
    # jitted forward is dispatched without syncing (z/p stay on device),
    # so forwards pipeline with host-side batch assembly; ONE
    # ``jax.device_get`` moves every logit at the end (same pattern as
    # train.trainer.run_validation; the reference transfers per batch
    # per model, infer.py:109-116).
    dev_zp: List[List] = []  # [batch][model] -> (z, p) device arrays
    valids: List[np.ndarray] = []
    all_ids: List[np.ndarray] = []
    for batch in loader:
        valids.append(np.asarray(batch.pop("valid")).astype(bool))
        all_ids.append(batch.pop("ids"))
        dev_zp.append([eval_step(params, batch) for params in params_list])
    dev_zp = jax.device_get(dev_zp)

    # Phase 2 — host work: calibration, clipping, and ensembling are
    # applied per batch (rank_avg ranks within a batch in the reference;
    # temperature/isotonic are elementwise, so batching is immaterial
    # for the other methods).
    all_p: List[np.ndarray] = []
    for bi, zp in enumerate(dev_zp):
        p_list, z_list = [], []
        for (z, p), cal in zip(zp, cals):
            z = np.asarray(z)
            p = np.asarray(p)
            if cfg.calibration.enabled and cal is not None:
                p = cal.predict_proba(z)
            p = np.clip(p, 1e-7, 1 - 1e-7)
            p_list.append(p)
            z_list.append(z)
        if len(p_list) == 1:
            p_ens = p_list[0]
        else:
            p_ens = ensemble_probs(
                method_use, p_list, z_list=z_list, weights=weights,
                trim_ratio=float(ens.trim_ratio),
            )
        all_p.append(np.asarray(p_ens)[valids[bi]])
        all_ids[bi] = all_ids[bi][valids[bi]]
    return {"ids": np.concatenate(all_ids), "probs": np.concatenate(all_p)}


def write_submission(path: str, ids: np.ndarray, probs: np.ndarray) -> str:
    """``ID,clicked`` CSV with %.8f probs (reference infer.py:166-173)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        f.write("ID,clicked\n")
        for i, p in zip(ids, probs):
            f.write(f"{i},{p:.8f}\n")
    return path


def infer_main(cfg: Config) -> str:
    man_path = cfg.data.manifest_test or os.path.join(
        cfg.data.cache_dir, "test", "manifest.json"
    )
    cache = ShardCache(man_path)
    out = predict_ensemble(cfg, cache)
    sub = os.path.join(cfg.exp_dir(), "submission.csv")
    return write_submission(sub, out["ids"], out["probs"])
