"""Regenerate the parity markdown report from a checkpointed
parity.json (tools/parity_vs_reference.py writes one after every leg,
so a partially-complete run can still be reported honestly).

Usage: python -m tossctr_tpu.tools.parity_report_from_json \
           --json runs/parity_flagship/parity.json \
           --report PARITY_FLAGSHIP.md
"""

from __future__ import annotations

import argparse
import json
from types import SimpleNamespace

from .parity_vs_reference import parity_verdict, summarize, write_report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", required=True)
    ap.add_argument("--report", required=True)
    ap.add_argument("--note", default=None,
                    help="extra note appended to the report")
    args = ap.parse_args()
    with open(args.json) as f:
        payload = json.load(f)
    results = payload["results"]
    summary = summarize(results)
    verdicts = parity_verdict(summary)
    run_args = SimpleNamespace(**payload["args"])
    write_report(run_args, results, summary, verdicts, args.report)
    if args.note:
        with open(args.report, "a") as f:
            f.write("\n" + args.note.strip() + "\n")
    print(f"# wrote {args.report} from {len(results)} completed legs")


if __name__ == "__main__":
    main()
