"""Training observability: plain-text log + JSONL metrics + optional
TensorBoard (reference: utils/tools.py:130-149, train.py:99-111), plus a
step timer for first-class per-step performance tracking (SURVEY.md §5 calls
out that the reference has none)."""

from __future__ import annotations

import json
import os
import time
from collections import deque


class TrainLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._text = open(os.path.join(log_dir, "log.txt"), "a")
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None
        self._step_times: deque[float] = deque(maxlen=100)
        self._last_tick: float | None = None

    def tick(self) -> None:
        """Call once per step for steps/s tracking."""
        now = time.perf_counter()
        if self._last_tick is not None:
            self._step_times.append(now - self._last_tick)
        self._last_tick = now

    @property
    def steps_per_sec(self) -> float:
        if not self._step_times:
            return 0.0
        return len(self._step_times) / sum(self._step_times)

    def log_losses(self, step: int, losses: dict[str, float],
                   prefix: str = "Loss") -> None:
        msg = (f"Step {step}, " + ", ".join(
            f"{k}: {v:.4f}" for k, v in losses.items()))
        self._text.write(msg + "\n")
        self._text.flush()
        record = {"step": step, "time": time.time(),
                  "steps_per_sec": round(self.steps_per_sec, 3), **losses}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in losses.items():
                self._tb.add_scalar(f"{prefix}/{k}", v, step)

    def log_figure(self, tag: str, fig, step: int) -> None:
        if self._tb is not None:
            self._tb.add_figure(tag, fig, step)

    def log_audio(self, tag: str, audio, sampling_rate: int, step: int) -> None:
        if self._tb is not None:
            peak = max(abs(float(audio.max())), abs(float(audio.min())), 1e-9)
            self._tb.add_audio(tag, audio / peak, step,
                               sample_rate=sampling_rate)

    def close(self) -> None:
        self._text.close()
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
