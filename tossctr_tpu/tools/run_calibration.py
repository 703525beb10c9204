"""Standalone OOF calibration (reference: src/tools/run_calibration.py).

Either consumes precomputed ``oof_z.npy``/``oof_y.npy``, or recomputes
out-of-fold logits by replaying the EXACT StratifiedGroupKFold split the
trainer used — ``max(5, n_splits)``, shuffle, same seed (the
split-determinism contract, reference run_calibration.py:76-90) — and
running each fold checkpoint (EMA-applied) over its validation subset.
A NaN sentinel verifies every row was filled (the reference uses a
255-sentinel memmap, :119-133).  Fits a Calibrator, reports
before/after AP/WLL/Score, saves ``cal_meta.json`` /
``oof_metrics.json`` / ``calibrator.pkl``.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

import numpy as np


def compute_oof_from_ckpts(cfg, manifest_path: str, exp_dir: str):
    import jax  # noqa: F401  (device selection already made by caller)
    from sklearn.model_selection import StratifiedGroupKFold

    from ..data.dataset import ShardCache
    from ..data.loader import BatchIterator
    from ..infer.predict import _params_with_ema
    from ..train.checkpoint import fold_ckpt_dir, load_fold_checkpoint
    from ..train.trainer import build_model, make_eval_step, run_validation

    cache = ShardCache(manifest_path)
    y = cache.labels()
    groups = cache.groups()
    n = y.shape[0]
    z_oof = np.full(n, np.nan, np.float64)

    n_splits = int(cfg.cv.n_splits)
    effective = max(5, n_splits)
    sgkf = StratifiedGroupKFold(n_splits=effective, shuffle=True, random_state=cfg.seed)
    model = build_model(cfg, cache.dims)
    eval_step = make_eval_step(model)

    folds_done = 0
    for fold, (tr, va) in enumerate(sgkf.split(np.zeros_like(y), y, groups)):
        d = fold_ckpt_dir(exp_dir, fold)
        if not os.path.exists(os.path.join(d, "meta.json")):
            continue
        ckpt = load_fold_checkpoint(d)
        params = _params_with_ema(ckpt)
        loader = BatchIterator(
            cache, va, batch_size=cfg.train.batch_size, train=True,
            shuffle=False, drop_last=False,
        )
        _, _, z = run_validation(eval_step, params, loader)
        z_oof[va] = z
        folds_done += 1

    filled = ~np.isnan(z_oof)
    if n_splits == 1 or folds_done < effective:
        # partial-fold runs calibrate on the covered subset
        return z_oof[filled], y[filled].astype(np.int32), int(filled.sum()), n
    assert filled.all(), f"OOF incomplete: {int((~filled).sum())} rows unfilled"
    return z_oof, y.astype(np.int32), n, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--oof-z", default=None, help="precomputed OOF logits .npy")
    ap.add_argument("--oof-y", default=None, help="precomputed OOF labels .npy")
    ap.add_argument("--method", default=None, help="override calibration.method")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--save-pickle", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tossctr_tpu.config import load_config
    from tossctr_tpu.eval.calibration import Calibrator
    from tossctr_tpu.eval.metrics import final_score

    cfg = load_config(args.cfg)
    exp_dir = cfg.exp_dir()
    out_dir = args.out_dir or exp_dir
    os.makedirs(out_dir, exist_ok=True)

    if args.oof_z and args.oof_y:
        z = np.load(args.oof_z)
        y = np.load(args.oof_y).astype(np.int32)
        covered, total = len(z), len(z)
    else:
        manifest = cfg.data.manifest_train or os.path.join(
            cfg.data.cache_dir, "train", "manifest.json"
        )
        z, y, covered, total = compute_oof_from_ckpts(cfg, manifest, exp_dir)
    print(f"OOF rows: {covered}/{total}")

    p_raw = 1 / (1 + np.exp(-np.clip(z, -50, 50)))
    ap0, wll0, s0 = final_score(y, p_raw, formula=cfg.eval.score_formula)

    c = cfg.calibration
    cal = Calibrator(
        method=args.method or c.method, lr=c.lr, iters=c.iters,
        clamp_T=c.clamp_T, l2_reg=c.l2_reg, min_iso_nodes=c.min_iso_nodes,
    ).fit(z, y)
    p_cal = cal.predict_proba(z)
    ap1, wll1, s1 = final_score(y, p_cal, formula=cfg.eval.score_formula)

    print(f"before: AP={ap0:.6f} WLL={wll0:.6f} Score={s0:.6f}")
    print(f"after:  AP={ap1:.6f} WLL={wll1:.6f} Score={s1:.6f}")

    with open(os.path.join(out_dir, "cal_meta.json"), "w") as f:
        json.dump(cal.meta(), f, indent=2)
    with open(os.path.join(out_dir, "oof_metrics.json"), "w") as f:
        json.dump(
            {
                "rows": int(covered), "total": int(total),
                "before": {"AP": ap0, "WLL": wll0, "Score": s0},
                "after": {"AP": ap1, "WLL": wll1, "Score": s1},
            },
            f, indent=2,
        )
    if args.save_pickle:
        with open(os.path.join(out_dir, "calibrator.pkl"), "wb") as f:
            pickle.dump(cal, f)
    print(f"wrote cal_meta.json / oof_metrics.json to {out_dir}")


if __name__ == "__main__":
    main()
