"""Console / CSV / TensorBoard logging (reference: src/utils/log.py:6-32).

Same observable behaviour: a rich console line per row, an append-only
``train_log.csv`` with the fixed column schema
``time,fold,epoch,split,loss,AP,WLL,Score,lr,bs,K,tau``, and per-fold
TensorBoard scalars.  TensorBoard import is lazy and optional.

Additions for the TPU build (SURVEY.md §5: the reference has no
profiling): ``examples_per_sec`` counters and an optional
``jax.profiler`` trace context.
"""

from __future__ import annotations

import csv
import os
import time
from contextlib import contextmanager

_CSV_COLS = ["fold", "epoch", "split", "loss", "AP", "WLL", "Score", "lr", "bs", "K", "tau"]


class RiderCounters:
    """Host-side accumulators fed from inside jitted programs via
    ``jax.debug.callback`` — production observability for quantities
    that would otherwise need a step-signature change (VERDICT r4 #5:
    the a2a grad-return overflow drops).  Each shard reports its LOCAL
    count; the host sum over shards and steps is the global total.
    Read-and-reset once per epoch from the train loop."""

    def __init__(self):
        self._counts: dict[str, int] = {}

    def add(self, name: str, value) -> None:
        self._counts[name] = self._counts.get(name, 0) + int(value)

    def read_and_reset(self, name: str) -> int:
        return self._counts.pop(name, 0)


riders = RiderCounters()


def _riders_add(name: str, value) -> None:  # jax.debug.callback target
    riders.add(name, value)


class Logger:
    def __init__(self, log_dir: str, tb: bool = True, csv_log: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.tb = None
        if tb:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(log_dir)
            except Exception:
                self.tb = None
        self.last_throughput: dict = {}
        self.csv_path = os.path.join(log_dir, "train_log.csv") if csv_log else None
        if self.csv_path and not os.path.exists(self.csv_path):
            with open(self.csv_path, "w", newline="") as f:
                csv.writer(f).writerow(["time"] + _CSV_COLS)
        try:
            from rich.console import Console

            self._console = Console()
        except Exception:
            self._console = None

    def scalars(self, tag: str, step: int, **kwargs) -> None:
        if self.tb:
            for k, v in kwargs.items():
                self.tb.add_scalar(f"{tag}/{k}", v, step)

    def row(self, **kwargs) -> None:
        msg = "  ".join(f"{k}={v}" for k, v in kwargs.items())
        if self._console is not None:
            self._console.print(msg)
        else:
            print(msg)

    def csv(self, **kwargs) -> None:
        if self.csv_path:
            with open(self.csv_path, "a", newline="") as f:
                row = [time.strftime("%Y-%m-%d %H:%M:%S")]
                row += [kwargs.get(k, "") for k in _CSV_COLS]
                csv.writer(f).writerow(row)

    # ---- TPU additions ----
    def throughput(self, tag: str, step: int, examples: int, seconds: float) -> None:
        eps = examples / max(seconds, 1e-9)
        # kept readable post-run (scripts/input_pipeline_bench.py reads
        # the trainer's own per-epoch counter instead of re-measuring)
        self.last_throughput[tag] = {
            "step": step, "examples": examples, "seconds": seconds, "eps": eps,
        }
        self.scalars(tag, step, examples_per_sec=eps)

    @contextmanager
    def profile(self, out_dir: str | None = None):
        """jax.profiler trace context (view with TensorBoard's profile tab)."""
        import jax

        d = out_dir or os.path.join(self.log_dir, "profile")
        jax.profiler.start_trace(d)
        try:
            yield d
        finally:
            jax.profiler.stop_trace()
