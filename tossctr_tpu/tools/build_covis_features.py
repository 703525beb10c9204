"""CLI: build covis OOF row features (reference:
src/tools/build_covis_features.py).

Wires ``cfg.features.covis`` + the cv section into CovisConfig and runs
folds -> pair stats -> row features, writing ``rowfeat_oof_all.parquet``
and ``rowfeat_test.parquet`` for the cache builder's covis join.
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    args = ap.parse_args()

    from tossctr_tpu.config import load_config
    from tossctr_tpu.features.covis import CovisConfig, build_covis_features

    cfg = load_config(args.cfg)
    ccfg = CovisConfig.from_cfg(cfg)
    out = build_covis_features(cfg.data.train_path, cfg.data.test_path, ccfg)
    for k, v in out.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
