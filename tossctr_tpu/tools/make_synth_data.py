"""CLI: generate a synthetic Toss-shaped train/test parquet pair.

The reference ships no test data (SURVEY.md §4); this is the entry
point the golden-file integration path starts from.
"""

import argparse

from tossctr_tpu.data.synth import write_synth_train_test


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--rows", type=int, default=20_000)
    ap.add_argument("--test-rows", type=int, default=4_000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    paths = write_synth_train_test(
        args.out, n_train=args.rows, n_test=args.test_rows, seed=args.seed
    )
    print(f"train: {paths['train']}\ntest:  {paths['test']}")


if __name__ == "__main__":
    main()
