"""CLI: ``python -m tossctr_tpu.infer --cfg cfgs/<exp>.yaml``
(reference entry point: python -m src.infer, infer.py:175-181)."""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from tossctr_tpu.config import load_config
    from tossctr_tpu.infer.predict import infer_main

    cfg = load_config(args.cfg)
    path = infer_main(cfg)
    print(f"[infer] wrote {path}")


if __name__ == "__main__":
    main()
