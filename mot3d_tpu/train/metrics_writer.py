"""Structured metric writer: JSONL + console, same scalar names as the
reference's tensorboard streams (SURVEY.md §5.5) so runs are comparable.

The reference splits logging between detectron2 EventStorage, a tracking
SummaryWriter and bare print()s; here one writer appends
{"step": ..., "split": ..., **scalars} lines to metrics.jsonl and mirrors to
stdout every `log_every` steps.

Device scalars are BUFFERED and fetched in blocks: a per-step
`jax.device_get` blocks the host on the step's completion AND pays a full
host<->device round trip (10-40 ms over the axon tunnel) — measured at
~360 ms/step loop time vs a 53 ms device step in the round-5 steady-state
study.  `write` therefore stages the raw (possibly device) scalars and only
materialises them every `log_every` steps (or on `flush`/`close`/echo), so
the train loop's dispatch pipeline never stalls on logging.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Mapping, Tuple


class MetricsWriter:
    def __init__(self, output_dir: str, log_every: int = 20):
        os.makedirs(output_dir, exist_ok=True)
        self.path = os.path.join(output_dir, "metrics.jsonl")
        self.log_every = log_every
        self._f = open(self.path, "a")
        self._t0 = time.time()
        # (step, split, scalars, echo, t) records not yet device_get-ed.
        self._pending: List[Tuple[int, str, Mapping, bool, float]] = []

    def write(self, step: int, scalars: Mapping[str, float],
              split: str = "train", echo: bool | None = None) -> None:
        echo = echo if echo is not None else (step % self.log_every == 0)
        self._pending.append((int(step), split, dict(scalars), echo,
                              round(time.time() - self._t0, 3)))
        if echo or len(self._pending) >= self.log_every:
            self.flush()

    def flush(self) -> None:
        """Materialise every buffered record with ONE device fetch."""
        if not self._pending:
            return
        import jax
        pending, self._pending = self._pending, []
        fetched = jax.device_get([rec[2] for rec in pending])
        for (step, split, _, echo, t), scalars in zip(pending, fetched):
            vals: Dict[str, float] = {k: float(v) for k, v in scalars.items()}
            rec = {"step": step, "split": split, "time": t, **vals}
            self._f.write(json.dumps(rec) + "\n")
            if echo:
                body = " ".join(f"{k}={v:.4f}" for k, v in vals.items())
                print(f"[{split} {step}] {body}", flush=True)
        self._f.flush()

    def close(self):
        self.flush()
        self._f.close()
