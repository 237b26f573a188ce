"""Logging and metrics: tab-separated log.txt, JSONL metrics, progress meter.

Capability parity with utils/log.py:27 (Logger), utils/utils.py:11 (Summary +
tensorboardX writer), utils/utils.py:95 (AverageMeter) and the vendored
progress bars.  The scalar stream goes to a JSONL file (always) and to
TensorBoard when tensorboardX is importable — same three channels as the
reference (text log / scalar events / console).
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional


class Logger:
    """Tab-separated metric rows with named columns, resumable."""

    def __init__(self, fpath: str, args=None, resume: bool = False):
        self.file = None
        self.resume = resume
        self.names = []
        self.numbers = {}
        if fpath is not None:
            if resume and os.path.exists(fpath):
                with open(fpath, "r") as f:
                    for line in f:
                        parts = line.rstrip("\n").split("\t")
                        if not self.names:
                            # args dumps precede the header row; the header
                            # is the first tab-separated non-numeric row
                            if len(parts) > 1 and parts[0] == "epoch":
                                self.names = parts
                                self.numbers = {n: [] for n in self.names}
                            continue
                        if len(parts) == len(self.names):
                            for i, v in enumerate(parts):
                                self.numbers[self.names[i]].append(v)
                self.file = open(fpath, "a")
            else:
                self.file = open(fpath, "w")
        if args is not None:
            self.record_args(str(args))

    def record_args(self, text: str):
        self.file.write(text + "\n")
        self.file.flush()

    def set_names(self, names):
        self.names = list(names)
        self.numbers = {name: [] for name in self.names}
        self.file.write("\t".join(self.names) + "\n")
        self.file.flush()

    def append(self, numbers):
        assert len(self.names) == len(numbers), "numbers do not match names"
        row = []
        for name, num in zip(self.names, numbers):
            if isinstance(num, int):
                row.append(f"{num}")
            else:
                row.append(f"{float(num):.6f}")
            self.numbers[name].append(num)
        self.file.write("\t".join(row) + "\n")
        self.file.flush()

    def close(self):
        if self.file is not None:
            self.file.close()


class MetricsWriter:
    """Scalar stream: JSONL always; TensorBoard when available."""

    def __init__(self, directory: str):
        os.makedirs(directory, exist_ok=True)
        self._jsonl = open(os.path.join(directory, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # type: ignore
            self._tb = SummaryWriter(log_dir=directory)
        except Exception:
            pass

    def add_scalar(self, tag: str, value, step: int):
        self._jsonl.write(json.dumps(
            {"tag": tag, "value": float(value), "step": int(step),
             "ts": time.time()}) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def flush(self):
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class Summary:
    """Iteration/epoch counters shared across the training phases
    (utils/utils.py:11-92)."""

    def __init__(self, directory: str):
        self.directory = directory
        self.epoch = 0
        self.phase = 0
        self.train_iter_num = 0
        self.train_realpose_iter_num = 0
        self.train_fakepose_iter_num = 0
        self.train_discrim_iter_num = 0
        self.test_iter_num = 0
        self.test_MPI3D_iter_num = 0
        self.writer: Optional[MetricsWriter] = None
        # per-epoch GAN scalar history (Wasserstein curves etc.), appended by
        # the GAN epoch runners and plotted at run end under
        # --record_all_picture (reference: special_operate.py:322 loss curves)
        self.epoch_scalar_history: dict = {}

    def record_epoch_scalars(self, scalars: dict) -> None:
        for k, v in scalars.items():
            self.epoch_scalar_history.setdefault(k, []).append(float(v))

    def create_summary(self) -> MetricsWriter:
        self.writer = MetricsWriter(self.directory)
        return self.writer

    def state_dict(self) -> dict:
        d = {k: getattr(self, k) for k in (
            "epoch", "phase", "train_iter_num", "train_realpose_iter_num",
            "train_fakepose_iter_num", "train_discrim_iter_num",
            "test_iter_num", "test_MPI3D_iter_num")}
        d["epoch_scalar_history"] = dict(self.epoch_scalar_history)
        return d

    def load_state_dict(self, d: dict):
        for k, v in d.items():
            if k == "epoch_scalar_history":
                self.epoch_scalar_history = {
                    kk: [float(x) for x in vv] for kk, vv in dict(v).items()}
            else:
                setattr(self, k, int(v))


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n=1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class ProgressMeter:
    """Minimal console progress line (replaces the vendored progress pkg)."""

    def __init__(self, title: str, total: int, stream=sys.stderr):
        self.title = title
        self.total = total
        self.start = time.time()
        self.stream = stream

    def update(self, i: int, suffix: str = ""):
        elapsed = time.time() - self.start
        rate = (i + 1) / max(elapsed, 1e-9)
        eta = (self.total - i - 1) / max(rate, 1e-9)
        self.stream.write(
            f"\r{self.title} ({i + 1}/{self.total}) "
            f"{elapsed:6.1f}s elapsed | ETA {eta:6.1f}s {suffix}")
        self.stream.flush()

    def finish(self):
        self.stream.write("\n")
        self.stream.flush()
