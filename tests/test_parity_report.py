"""The parity report regenerator (tools/parity_report_from_json.py)
must reproduce summaries/verdicts from a checkpointed parity.json —
the flagship parity run reports from partial legs while long
reference legs are still running."""

from __future__ import annotations

import json
import subprocess
import sys


def test_report_roundtrip(tmp_path):
    payload = {
        "args": {
            "out": "x", "rows": 1000, "seeds": "0,1", "epochs": 2,
            "batch": 64, "lr": 0.001, "emb_dim": 16, "max_len": 32,
            "top_k": 8, "layers": 2, "heads": 4, "ema_warmup_steps": 5,
            "balanced_sampler": True, "pos_fraction": 0.5, "fold": 0,
            "ours_modes": "rowwise_adagrad", "ema": True,
            "calibration": True, "skip_reference": False, "report": None,
        },
        "results": [
            {"framework": "ours_jax_rowwise_adagrad", "seed": 0,
             "best_score": 0.41, "seconds": 1.0,
             "best": {"epoch": 2, "AP": 0.12, "WLL": 0.70, "Score": 0.41},
             "history": []},
            {"framework": "reference_torch", "seed": 0,
             "best_score": 0.405, "seconds": 2.0,
             "best": {"epoch": 2, "AP": 0.11, "WLL": 0.70, "Score": 0.405},
             "history": []},
            {"framework": "ours_jax_rowwise_adagrad", "seed": 1,
             "best_score": 0.43, "seconds": 1.0,
             "best": {"epoch": 1, "AP": 0.13, "WLL": 0.73, "Score": 0.43},
             "history": []},
            {"framework": "reference_torch", "seed": 1,
             "best_score": 0.435, "seconds": 2.0,
             "best": {"epoch": 1, "AP": 0.14, "WLL": 0.73, "Score": 0.435},
             "history": []},
        ],
    }
    jpath = tmp_path / "parity.json"
    jpath.write_text(json.dumps(payload))
    report = tmp_path / "P.md"
    out = subprocess.run(
        [sys.executable, "-m", "tossctr_tpu.tools.parity_report_from_json",
         "--json", str(jpath), "--report", str(report), "--note", "N."],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    text = report.read_text()
    assert "PARITY" in text
    assert "| ours_jax_rowwise_adagrad | 0 |" in text
    assert "N." in text
    # |delta means| = |0.42 - 0.42| = 0 -> parity
    assert "→ **PARITY**" in text
