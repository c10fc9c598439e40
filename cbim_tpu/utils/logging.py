"""Logging, meters, and metric writing (reference utils.py:10-99,
training/utils.py:17-28).

Process-0 gating replaces the reference's rank gating: in a multi-host GSPMD
run only ``jax.process_index() == 0`` logs INFO and writes files.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time


def is_master() -> bool:
    try:
        import jax
        return jax.process_index() == 0
    except Exception:
        return True


def configure_logger(log_file: str | None = None) -> None:
    """stdout + optional file handler; non-master processes log WARNING+."""
    level = logging.INFO if is_master() else logging.WARNING
    handlers = [logging.StreamHandler(sys.stdout)]
    if log_file and is_master():
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        handlers.append(logging.FileHandler(log_file, mode="a"))
    logging.basicConfig(level=level, format="%(asctime)s %(message)s",
                        handlers=handlers, force=True)


class AverageMeter:
    """reference utils.py:59-78."""

    def __init__(self, name: str, fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self):
        return ("{name} {val" + self.fmt + "} ({avg" + self.fmt + "})").format(
            name=self.name, val=self.val, avg=self.avg)


class ProgressMeter:
    """reference utils.py:81-99."""

    def __init__(self, num_batches: int, meters, prefix: str = ""):
        num_digits = len(str(num_batches // 1))
        self.batch_fmtstr = "[{:" + str(num_digits) + "d}/" + str(num_batches) + "]"
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [self.prefix + self.batch_fmtstr.format(batch)]
        entries += [str(m) for m in self.meters]
        logging.info("  ".join(entries))


class MetricWriter:
    """Scalar metric sink: JSONL always; TensorBoard when available.

    Replaces the reference's SummaryWriter usage (train.py:73,133,233) with a
    dependency-light JSONL stream (one line per scalar) plus an optional
    torch TensorBoard writer if importable.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self._tb = None
        self._f = None
        if is_master():
            os.makedirs(log_dir, exist_ok=True)
            self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a")
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value, step: int):
        if self._f is not None:
            self._f.write(json.dumps({"tag": tag, "value": float(value),
                                      "step": int(step), "t": time.time()}) + "\n")
            self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self):
        if self._f is not None:
            self._f.close()
        if self._tb is not None:
            self._tb.close()


def log_evaluation_result(writer: MetricWriter, dice, asd, hd, name: str,
                          epoch: int):
    """reference training/utils.py:17-28."""
    writer.add_scalar(f"Dice/{name}_AVG", dice.mean(), epoch + 1)
    for i, v in enumerate(dice):
        writer.add_scalar(f"Dice/{name}_Dice{i + 1}", v, epoch + 1)
    writer.add_scalar(f"ASD/{name}_AVG", asd.mean(), epoch + 1)
    for i, v in enumerate(asd):
        writer.add_scalar(f"ASD/{name}_ASD{i + 1}", v, epoch + 1)
    writer.add_scalar(f"HD/{name}_AVG", hd.mean(), epoch + 1)
    for i, v in enumerate(hd):
        writer.add_scalar(f"HD/{name}_HD{i + 1}", v, epoch + 1)
