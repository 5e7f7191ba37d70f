"""Metric logging (parity target: the reference's TensorBoard scalar writers,
ref train.py:119-120/216-218 and ref yolo_v1.py:835-846 ``LossTensorCallback``).

Backend-agnostic: always writes JSONL (machine-readable) + stdout; uses
TensorBoard via ``tf.summary`` when TensorFlow is importable (it is optional —
the framework itself has no TF dependency).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True, name: str = "train"):
        os.makedirs(log_dir, exist_ok=True)
        self._path = os.path.join(log_dir, f"{name}.jsonl")
        self._file = open(self._path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf  # optional

                self._tb = tf.summary.create_file_writer(
                    os.path.join(log_dir, "tb", name))
            except ImportError:
                self._tb = None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "") -> None:
        rec = {"step": step, "time": time.time()}
        rec.update({prefix + k: float(v) for k, v in metrics.items()})
        self._file.write(json.dumps(rec) + "\n")
        self._file.flush()
        if self._tb is not None:
            with self._tb.as_default():
                import tensorflow as tf

                for k, v in metrics.items():
                    tf.summary.scalar(prefix + k, float(v), step=step)

    def close(self) -> None:
        self._file.close()
