"""Metric logging: CSV streams (reference-compatible schema) + TensorBoard.

The reference exports TensorBoard scalars to CSVs with columns
``(Wall time, Step, Value)`` (src/scripts/report/logs/*.csv headers, consumed
by generate_figures.py:27-37).  ``CsvLogger`` writes the same schema so the
report tooling can re-plot either framework's runs; ``TensorBoardLogger``
wraps tensorboardX when present.
"""

from __future__ import annotations

import csv
import os
import time


class CsvLogger:
    """One CSV file per metric tag, reference schema: Wall time,Step,Value."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._files: dict[str, object] = {}
        self._writers: dict[str, csv.writer] = {}

    def log(self, tag: str, step: int, value: float) -> None:
        if tag not in self._writers:
            f = open(os.path.join(self.log_dir, f"{tag}.csv"), "a", newline="")
            w = csv.writer(f)
            if f.tell() == 0:
                w.writerow(["Wall time", "Step", "Value"])
            self._files[tag] = f
            self._writers[tag] = w
        self._writers[tag].writerow([time.time(), step, float(value)])
        self._files[tag].flush()

    def log_dict(self, metrics: dict, step: int) -> None:
        for tag, value in metrics.items():
            self.log(tag, step, value)

    def close(self) -> None:
        for f in self._files.values():
            f.close()
        self._files.clear()
        self._writers.clear()


class TensorBoardLogger:
    """tensorboardX-backed scalar logging; silently no-ops if unavailable."""

    def __init__(self, log_dir: str):
        try:
            from tensorboardX import SummaryWriter
            self.writer = SummaryWriter(log_dir)
        except ImportError:
            self.writer = None

    def log(self, tag: str, step: int, value: float) -> None:
        if self.writer is not None:
            self.writer.add_scalar(tag, float(value), step)

    def log_dict(self, metrics: dict, step: int) -> None:
        for tag, value in metrics.items():
            self.log(tag, step, value)

    def close(self) -> None:
        if self.writer is not None:
            self.writer.close()


class MultiLogger:
    def __init__(self, *loggers):
        self.loggers = [l for l in loggers if l is not None]

    def log(self, tag: str, step: int, value: float) -> None:
        for l in self.loggers:
            l.log(tag, step, value)

    def log_dict(self, metrics: dict, step: int) -> None:
        for l in self.loggers:
            l.log_dict(metrics, step)

    def close(self) -> None:
        for l in self.loggers:
            l.close()
