"""CLI: ``python -m tossctr_tpu.train --cfg cfgs/<exp>.yaml``
(reference entry point: python -m src.train, train.py:361-366).

``--build-cache`` runs the ETL first when the shard cache is missing
(replacing the reference's shard.sh inline python)."""

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--build-cache", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tossctr_tpu.config import load_config
    from tossctr_tpu.train.trainer import train_main

    cfg = load_config(args.cfg)
    manifest = cfg.data.manifest_train or os.path.join(
        cfg.data.cache_dir, "train", "manifest.json"
    )
    if args.build_cache or not os.path.exists(manifest):
        from tossctr_tpu.data.etl import build_train_and_test

        print(f"[etl] building shard cache under {cfg.data.cache_dir}")
        mp_tr, mp_te = build_train_and_test(cfg)
        print(f"[etl] train manifest: {mp_tr}\n[etl] test manifest:  {mp_te}")

    exp_dir = train_main(cfg)
    print(f"[train] done: {exp_dir}")


if __name__ == "__main__":
    main()
