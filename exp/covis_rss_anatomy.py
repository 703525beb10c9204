"""Attribute the covis-build RSS creep (VERDICT r4 next#9).

tests/test_covis_rss.py tolerates 1.2x + 120 MB peak-RSS growth per
row-count doubling.  This probe runs the same child build at 1M and 2M
rows with TOSSCTR_COVIS_RSS_LOG=1 (phase-boundary RSS lines emitted by
features/covis._phase_rss) and prints the per-phase current/peak RSS
side by side, so the creep lands on a named phase instead of folklore.

Usage: python exp/covis_rss_anatomy.py [workdir]
"""

import importlib.util
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

spec = importlib.util.spec_from_file_location(
    "test_covis_rss", os.path.join(REPO, "tests", "test_covis_rss.py")
)
tcr = importlib.util.module_from_spec(spec)
spec.loader.exec_module(tcr)


def run_child(workdir: str, train: str, tag: str) -> tuple[dict, list]:
    child = os.path.join(workdir, "covis_child.py")
    if not os.path.exists(child):
        with open(child, "w") as f:
            f.write(tcr._CHILD)
    env = dict(os.environ, JAX_PLATFORMS="cpu", TOSSCTR_COVIS_RSS_LOG="1")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, child, train, os.path.join(workdir, f"out_{tag}")],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-4000:]
    rec = json.loads(out.stdout.strip().splitlines()[-1])
    phases = [
        json.loads(line)
        for line in out.stderr.splitlines()
        if line.startswith('{"covis_rss_phase"')
    ]
    return rec, phases


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(
        prefix="covis_rss_")
    print(f"# workdir: {workdir}")
    runs = {}
    for tag, n in (("1m", tcr.N_ROWS // 2), ("2m", tcr.N_ROWS)):
        train = os.path.join(workdir, f"train_{tag}.parquet")
        if not os.path.exists(train):
            tcr._write_big_parquet(train, n)
        rec, phases = run_child(workdir, train, tag)
        runs[tag] = {p["covis_rss_phase"]: p for p in phases}
        runs[tag]["_final"] = rec
        print(f"# {tag}: peak {rec['rss_mb']:.0f} MB")

    print(f"\n{'phase':18s} {'1m now':>8s} {'1m peak':>8s} "
          f"{'2m now':>8s} {'2m peak':>8s} {'d_now':>7s} {'d_peak':>7s}")
    for ph in ("start", "pass1_folds", "pass2_accumulate",
               "pair_tables", "pass3_oof"):
        a = runs["1m"].get(ph)
        b = runs["2m"].get(ph)
        if not (a and b):
            continue
        print(f"{ph:18s} {a['rss_now_mb']:8.0f} {a['rss_peak_mb']:8.0f} "
              f"{b['rss_now_mb']:8.0f} {b['rss_peak_mb']:8.0f} "
              f"{b['rss_now_mb'] - a['rss_now_mb']:7.0f} "
              f"{b['rss_peak_mb'] - a['rss_peak_mb']:7.0f}")


if __name__ == "__main__":
    main()
