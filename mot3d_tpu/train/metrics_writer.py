"""Structured metric writer: JSONL + console, same scalar names as the
reference's tensorboard streams (SURVEY.md §5.5) so runs are comparable.

The reference splits logging between detectron2 EventStorage, a tracking
SummaryWriter and bare print()s; here one writer appends
{"step": ..., "split": ..., **scalars} lines to metrics.jsonl and mirrors to
stdout every `log_every` steps.  Device arrays are fetched asynchronously
(jax.device_get on already-computed values) so logging never blocks the TPU.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Mapping


class MetricsWriter:
    def __init__(self, output_dir: str, log_every: int = 20):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self.log_every = log_every
        self._f = open(self.path, "a")
        self._t0 = time.time()

    def write(self, step: int, scalars: Mapping[str, float],
              split: str = "train", echo: bool | None = None) -> None:
        import jax
        vals: Dict[str, float] = {
            k: float(jax.device_get(v)) for k, v in scalars.items()}
        rec = {"step": int(step), "split": split,
               "time": round(time.time() - self._t0, 3), **vals}
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if echo if echo is not None else (step % self.log_every == 0):
            body = " ".join(f"{k}={v:.4f}" for k, v in vals.items())
            print(f"[{split} {step}] {body}", flush=True)

    def close(self):
        self._f.close()
