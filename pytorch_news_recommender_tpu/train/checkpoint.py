"""Orbax checkpointing: full train state (params + optimizer + step), config,
and metrics — replacing the reference's metadata-in-filename ``state_dict``
dumps (``MIND_2020/train_eval.py:142,149``:
``T{ts}_{model}_epoch{E}_iter_{I}_auc_{A:.3f}.ckpt``) which lose the
optimizer state and step counter on resume (SURVEY.md §5).

Layout under ``dir/``:

* ``<step>/``      — Orbax composite: ``state`` (pytree) + ``metrics`` (json)
* ``config.json``  — the run's full :class:`Config`
* best-AUC retention: keeps ``max_to_keep`` best checkpoints by dev AUC, the
  reference's keep-best-AUC behavior made explicit.

Restore is exact: optimizer moments and step resume where they left off (the
train loop's dropout RNG is ``fold_in(step)`` so randomness is
resume-deterministic too).
"""

from __future__ import annotations

import pathlib
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp

from pytorch_news_recommender_tpu.config import Config


class CheckpointManager:
    """Best-AUC checkpoint retention over Orbax."""

    def __init__(self, directory: str | pathlib.Path, cfg: Optional[Config] = None,
                 max_to_keep: int = 3):
        self.directory = pathlib.Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        if cfg is not None:
            cfg.save(self.directory / "config.json")
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda m: m.get("auc", 0.0),
            best_mode="max",
        )
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=options,
            item_names=("state", "metrics"),
        )

    def save(self, step: int, state: Any, metrics: Dict[str, float]) -> None:
        metrics = {k: float(v) for k, v in metrics.items()
                   if isinstance(v, (int, float))}
        self._mngr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                metrics=ocp.args.JsonSave(metrics),
            ),
            metrics=metrics,
        )
        self._mngr.wait_until_finished()

    def best_step(self) -> Optional[int]:
        return self._mngr.best_step()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure/shardings of ``state_template``
        (typically a freshly built ``Trainer.init_state()``)."""
        if step is None:
            step = self.best_step()
            if step is None:
                step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          state_template)
        out = self._mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract)),
        )
        return out["state"]

    def restore_metrics(self, step: Optional[int] = None) -> Dict[str, float]:
        if step is None:
            step = self.best_step() or self.latest_step()
        out = self._mngr.restore(
            step, args=ocp.args.Composite(metrics=ocp.args.JsonRestore()))
        return out["metrics"]

    def close(self) -> None:
        self._mngr.close()


def load_config(directory: str | pathlib.Path) -> Config:
    return Config.load(pathlib.Path(directory) / "config.json")
