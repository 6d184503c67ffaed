"""Checkpointing: one Orbax tree per step + best-metric pointers.

Replaces the reference's two parallel systems (SURVEY.md §5.4): detectron2's
DetectionCheckpointer with best-by-val-loss/`val_metrics.json`
(`Detection/evaluator/EvaluatorUtils.py:333-355`) and best-by-MOTA/
`mota_metrics.json` (`Detection/train_combined.py:94-124`), plus the
tracking side's hand-rolled per-module torch.save
(`Tracking/mpn_trainer.py:860-960`).  Here the full train state (all params,
both optimizer states, step) is ONE pytree; "best" checkpoints are tracked
per metric name with a json metadata file, mirroring the reference's
behaviour of keeping running-best metrics across restarts.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )
        self._meta_path = os.path.join(self.directory, "best_metrics.json")
        self.best: Dict[str, dict] = {}
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self.best = json.load(f)

    # ------------------------------------------------------------------
    def save(self, step: int, state: Any) -> bool:
        """Returns orbax's accept bool: False means the save was SKIPPED
        (e.g. the step already exists) — callers that must not lose the
        state (the import CLI) assert on it."""
        saved = self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        return bool(saved)

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    # ------------------------------------------------------------------
    def update_best(self, metric_name: str, value: float, step: int,
                    state: Any, higher_is_better: bool = True) -> bool:
        """Save a best-by-metric checkpoint if `value` improves.

        Mirrors `check_save_models` (`Detection/train_combined.py:94-124`,
        best-by-MOTA) and `_save_valmodel`
        (`Tracking/mpn_trainer.py:905-930`, best-by-val-loss).
        Returns True when a new best was recorded.
        """
        prev = self.best.get(metric_name)
        improved = (prev is None
                    or (value > prev["value"]) == higher_is_better
                    and value != prev["value"])
        if not improved:
            return False
        best_dir = os.path.join(self.directory, f"best_{metric_name}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(best_dir, "state"), state, force=True)
        ckptr.wait_until_finished()
        self.best[metric_name] = {"value": float(value), "step": int(step)}
        with open(self._meta_path, "w") as f:
            json.dump(self.best, f, indent=2)
        return True

    def restore_best(self, metric_name: str, state_template: Any) -> Any:
        best_dir = os.path.join(self.directory, f"best_{metric_name}",
                                "state")
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(best_dir, target=state_template)


def resume_trainer(trainer) -> Optional[int]:
    """Restore the latest FULL train state (params, every optimizer state,
    step) into `trainer.state` so a killed run continues where it stopped —
    the reference's `DetectionCheckpointer.resume_or_load(resume=True)`
    path (`Detection/train_net.py:99-110`), which detectron2 uses to reload
    model + optimizer + scheduler + iteration.

    `trainer.state` must already be initialised (it is the restore
    template).  Returns the restored step, or None when the checkpoint
    directory has no saved state (fresh run).
    """
    if trainer.state is None:
        raise RuntimeError("init_state() must run before resume")
    restored = trainer.ckpt.restore(trainer.state)
    if restored is None:
        return None
    trainer.state = restored
    step = int(restored.step)
    print(f"resumed training from step {step} "
          f"({trainer.ckpt.directory})")
    return step
