"""Orbax checkpointing with a best-by-val-loss policy (parity target:
ref train.py:150-157 ``ModelCheckpoint(save_best_only=True)`` /
ref yolo_v1.py:923-929).

Improvement over the reference (SURVEY.md §5): the full train state —
params, batch stats, optimizer state, AND step counter — is checkpointed
(the reference saves weights only and cannot resume the optimizer), with
async saves so the device keeps training during serialization.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    """Keeps the latest N checkpoints plus the best-by-metric one."""

    def __init__(self, directory: str, max_to_keep: int = 3,
                 monitor: str = "val_loss", mode: str = "min"):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._monitor = monitor
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda metrics: metrics[monitor],
                best_mode=mode,
                enable_async_checkpointing=True,
            ),
        )

    def save(self, step: int, state: Any, metrics: dict) -> None:
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={self._monitor: float(metrics[self._monitor])},
        )

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_template``. ``step=None``
        restores the best checkpoint (falling back to latest).

        Version-tolerant: fields present in the template but absent in an
        older checkpoint (e.g. ``ema_params`` added after the save) keep
        their template values instead of failing the structural match.
        """
        if step is None:
            step = self._mgr.best_step()
            if step is None:
                step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError("no checkpoint found")
        try:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(state_template))
        except ValueError:
            import dataclasses

            meta = self._mgr.item_metadata(step)
            on_disk = set(getattr(meta, "tree", meta).keys())
            fields = {
                f.name: getattr(state_template, f.name)
                for f in dataclasses.fields(type(state_template))
                if f.name in on_disk
            }
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(fields))
            return state_template.replace(**restored)

    @property
    def all_steps(self) -> list:
        return sorted(self._mgr.all_steps())

    @property
    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    @property
    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    @property
    def latest_epoch(self) -> Optional[int]:
        """The checkpoint axis IS the epoch number (``Trainer.fit`` saves with
        ``save(epoch, ...)``), so resuming should continue from
        ``latest_epoch + 1`` — robust to batch-size or dataset-size changes,
        unlike inferring the epoch from the optimizer step count."""
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def average_checkpoints(manager: CheckpointManager, state_template: Any,
                        steps: Optional[list] = None, last_k: int = 0) -> Any:
    """Uniform checkpoint averaging (SWA-flavored serving trick, beyond
    parity — the reference serves a single best checkpoint,
    ref train.py:150-157): average ``params`` (and ``ema_params`` /
    ``batch_stats`` when present) across checkpoints.

    ``steps``: explicit checkpoint steps; default = all retained, or the
    newest ``last_k`` of them when given. Optimizer state / step counter come
    from the NEWEST averaged checkpoint (averaging optimizer moments across
    epochs is meaningless). Averaging BN running stats is the standard SWA
    approximation — exact SWA would re-estimate them with a data pass.
    """
    import jax

    if steps is None:
        steps = manager.all_steps
        if last_k:
            steps = steps[-last_k:]
    if not steps:
        raise FileNotFoundError("no checkpoints to average")
    states = [manager.restore(state_template, step=s) for s in sorted(steps)]

    def mean(*leaves):
        return sum(leaves[1:], leaves[0]) / len(leaves)

    out = states[-1]
    for field in ("params", "batch_stats", "ema_params"):
        vals = [getattr(s, field, None) for s in states]
        if any(v is None for v in vals):
            continue
        out = out.replace(**{field: jax.tree_util.tree_map(mean, *vals)})
    return out
