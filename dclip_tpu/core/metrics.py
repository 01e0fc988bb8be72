"""Structured metrics + profiling: the observability layer the reference
lacks (SURVEY.md §5: print() + tqdm only).

- `MetricsLogger`: CSV rows + stdout lines with the reference's metric
  names (train_loss / val_loss etc., CLIP_image_distillation.py:632,674).
- `trace_span`: jax.profiler annotation around train-step / input-pipeline
  sections; `start_trace`/`stop_trace` wrap perfetto dumps.
"""
from __future__ import annotations

import contextlib
import csv
import os
import time
from typing import Dict, Iterator, Optional

import jax


class MetricsLogger:
    def __init__(self, csv_path: Optional[str] = None, print_every: int = 10):
        self.csv_path = csv_path
        self.print_every = max(print_every, 1)
        self._writer = None
        self._file = None
        self._fields = None
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        """Write a CSV row and print. Callers decide the cadence (the
        trainers gate on batches-per-epoch); gating here too would
        double-filter and go silent whenever epoch boundaries misalign the
        global step with print_every."""
        metrics = {k: float(v) for k, v in metrics.items()}
        row = {"step": step, "time": time.time() - self._t0, **metrics}
        if self.csv_path:
            if self._writer is None:
                os.makedirs(
                    os.path.dirname(os.path.abspath(self.csv_path)) or ".",
                    exist_ok=True,
                )
                self._file = open(self.csv_path, "a", newline="")
                self._fields = list(row)
                self._writer = csv.DictWriter(self._file, fieldnames=self._fields)
                if self._file.tell() == 0:
                    self._writer.writeheader()
            self._writer.writerow({k: row.get(k, "") for k in self._fields})
            self._file.flush()
        parts = ", ".join(f"{k}={v:.4f}" for k, v in metrics.items())
        print(f"{prefix}step {step}: {parts}")

    def close(self) -> None:
        if self._file:
            self._file.close()
            self._file = self._writer = None


@contextlib.contextmanager
def trace_span(name: str) -> Iterator[None]:
    """Named region in the jax profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_trace(log_dir: str) -> None:
    jax.profiler.start_trace(log_dir)


def stop_trace() -> None:
    jax.profiler.stop_trace()
