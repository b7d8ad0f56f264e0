"""Metrics logging + profiling hooks.

Replaces the reference's tensorboard scalar/image logging (train.py:362-416,
Lightning TensorBoardLogger) and the easyvolcap/torch-profiler wrappers
(train.py:31,433-444, cfg.profiler): scalars go to a JSONL stream (always)
and to TensorBoard via tf.summary when tensorflow is importable; traces come
from jax.profiler (viewable in tensorboard/xprof or perfetto).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class MetricsLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a",
                           buffering=1)
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf
                self._tb = tf.summary.create_file_writer(log_dir)
            except Exception:
                self._tb = None

    def log_scalars(self, step: int, scalars: dict[str, Any],
                    prefix: str = "") -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({f"{prefix}{k}": float(v) for k, v in scalars.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(f"{prefix}{k}", float(v), step=step)

    def log_image(self, step: int, name: str, image) -> None:
        if self._tb is not None:
            import numpy as np
            import tensorflow as tf
            img = np.asarray(image)
            if img.dtype != "uint8":
                img = (img.clip(0, 1) * 255).astype("uint8")
            with self._tb.as_default():
                tf.summary.image(name, img[None], step=step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class ProfilerHook:
    """jax.profiler trace over a configured iteration window
    (cfg.profiler: enabled/start_iter/num_iters/trace_dir — the
    setup_profiler analog)."""

    def __init__(self, cfg_profiler, default_dir: str):
        self.enabled = bool(cfg_profiler.get("enabled", False))
        self.start_iter = int(cfg_profiler.get("start_iter", 10))
        self.num_iters = int(cfg_profiler.get("num_iters", 5))
        self.trace_dir = cfg_profiler.get("trace_dir") or \
            os.path.join(default_dir, "traces")
        self._active = False

    def step(self, iteration: int) -> None:
        if not self.enabled:
            return
        import jax
        if iteration == self.start_iter and not self._active:
            os.makedirs(self.trace_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
        elif self._active and iteration >= self.start_iter + self.num_iters:
            jax.profiler.stop_trace()
            self._active = False
            print(f"profiler trace written to {self.trace_dir}")

    def close(self) -> None:
        if self._active:
            import jax
            jax.profiler.stop_trace()
            self._active = False
