"""Checkpoint / resume via Orbax.

Reference contract being preserved (SURVEY §1 "contract between Training and
Evaluation layers"): fixed artifact names in a saved-models directory —
``generator_final``, ``discriminator_final``, ``forward_model_final``,
``forward_model_pretrained`` (written at unified_trainer.py:643-651 /
train_pigan.py:299-309, read at unified_evaluator.py:89-99, and unit-tested
by the reference at test_unified_training.py:109-136).  Periodic checkpoints
keep epoch + model + optimizer + scheduler state exactly like
unified_constraint_trainer.py:1114-1176 — here that is simply the whole
`PiGanState` pytree, saved/restored in one call.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

# Fixed artifact names (parity with the reference's *.pth contract).
GENERATOR_FINAL = "generator_final"
DISCRIMINATOR_FINAL = "discriminator_final"
FORWARD_MODEL_FINAL = "forward_model_final"
FORWARD_MODEL_PRETRAINED = "forward_model_pretrained"
# EMA generator track (new capability, saved alongside the trio when the
# run trained with StepSettings.ema_decay > 0)
GENERATOR_EMA = "generator_ema"
TRAIN_STATE = "train_state"
# Architecture sections persisted next to the finals so evaluate/export can
# rebuild matching modules (torch checkpoints embed their module graphs;
# Orbax pytrees do not)
MODEL_CONFIG = "model_config.json"


def save_model_config(directory: str, config) -> None:
    """Write the generator/discriminator/forward_model config sections as
    JSON next to the finals; `load_model_config` + the CLI's auto-overlay
    rebuild the exact architectures without re-specifying --set flags."""
    import json

    from ..config import _to_dict

    d = _to_dict(config)
    sections = {
        k: d[k] for k in ("generator", "discriminator", "forward_model")
    }
    # artifact-semantics data fields (round 5): the de/normalization
    # bounds and grid BAKE INTO exported artifacts and evaluators — a
    # consumer with a different param range would silently mis-scale
    # physical parameters.  (num_samples etc. deliberately excluded: they
    # are run-shape knobs, not artifact semantics.)
    sections["data"] = {
        k: d["data"][k]
        for k in ("param_min", "param_max", "spectrum_dim",
                  "freq_min", "freq_max")
    }
    os.makedirs(os.path.abspath(directory), exist_ok=True)
    with open(_path(directory, MODEL_CONFIG), "w") as fh:
        json.dump(sections, fh, indent=2)


def load_model_config(directory: str):
    """The saved architecture sections as a dict, or None if absent."""
    import json

    p = _path(directory, MODEL_CONFIG)
    if not os.path.isfile(p):
        return None
    with open(p) as fh:
        return json.load(fh)


# Loss curves persisted next to the finals so `evaluate --plot` can render
# the reference's training-history panel (visualization.py:331-341) from a
# saved-models directory — load_final restores weights only, and the
# composite CheckpointManager payload is a different artifact.
TRAIN_HISTORY = "training_history.json"


def save_train_history(directory: str, history) -> None:
    """Write the Trainer's flat {metric: [per-epoch floats]} history as
    JSON next to the finals (skipped when empty)."""
    import json

    if not history:
        return
    os.makedirs(os.path.abspath(directory), exist_ok=True)
    with open(_path(directory, TRAIN_HISTORY), "w") as fh:
        json.dump(history, fh)


def load_train_history(directory: str):
    """The saved history dict, or None if absent."""
    import json

    p = _path(directory, TRAIN_HISTORY)
    if not os.path.isfile(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _path(directory: str, name: str) -> str:
    return os.path.join(os.path.abspath(directory), name)


def save_pytree(directory: str, name: str, tree: Any) -> str:
    """Save any pytree (model variables, a full train state, history dict)."""
    path = _path(directory, name)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def restore_pytree(directory: str, name: str, template: Any) -> Any:
    """Restore a pytree saved by `save_pytree`; `template` supplies structure
    and shapes (abstract values are fine)."""
    path = _path(directory, name)
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
    return ckptr.restore(path, target)


def exists(directory: str, name: str) -> bool:
    return os.path.isdir(_path(directory, name))


def save_final_trio(directory: str, state, backup_tag: str | None = None) -> None:
    """Write the three final model artifacts under their contract names
    (train_pigan.py:299-304), plus the EMA generator when the state carries
    one (saved as full generator variables: EMA params + live aux
    collections, loadable anywhere a generator checkpoint is).

    `backup_tag` additionally writes per-mode backup copies — the
    reference's `*_unified/_optimized/_emergency.pth` versioned artifacts
    (unified_trainer.py:653-662, optimized_trainer.py:500-506) as
    `generator_<tag>` etc. alongside the finals."""
    save_pytree(directory, GENERATOR_FINAL, state.g.variables)
    save_pytree(directory, DISCRIMINATOR_FINAL, state.d.variables)
    save_pytree(directory, FORWARD_MODEL_FINAL, state.f.variables)
    if getattr(state, "g_ema", None) is not None:
        save_pytree(
            directory, GENERATOR_EMA, {"params": state.g_ema, **state.g.extra}
        )
    if backup_tag:
        if backup_tag in ("final", "ema", "pretrained"):
            # would clobber a canonical artifact with different content
            # (e.g. generator_ema = EMA params, not live params)
            raise ValueError(
                f"backup_tag {backup_tag!r} collides with a canonical "
                "artifact name (generator_final/generator_ema/"
                "forward_model_pretrained); pick another tag"
            )
        save_pytree(directory, f"generator_{backup_tag}", state.g.variables)
        save_pytree(directory, f"discriminator_{backup_tag}", state.d.variables)
        save_pytree(directory, f"forward_model_{backup_tag}", state.f.variables)


def load_final_trio(directory: str, g_template, d_template, f_template):
    """Read the trio back (unified_evaluator.py:55-111)."""
    g = restore_pytree(directory, GENERATOR_FINAL, g_template)
    d = restore_pytree(directory, DISCRIMINATOR_FINAL, d_template)
    f = restore_pytree(directory, FORWARD_MODEL_FINAL, f_template)
    return g, d, f


def _config_meta(config) -> Any:
    """JSON-able view of a PiGanConfig (or pass dicts through untouched)."""
    if config is None:
        return None
    if isinstance(config, dict):
        return config
    from ..config import _to_dict

    return _to_dict(config)


class CheckpointManager:
    """Periodic full-state checkpoints with retention, plus named finals.

    TPU preemption is routine; the manager makes `resume-from-latest` a
    one-liner, upgrading the reference's epoch-interval torch.save pattern
    (train_pigan.py:283-295) to real preemption recovery (SURVEY §5).

    Payload parity with the reference's full checkpoint
    (unified_constraint_trainer.py:1114-1138): each step saves the whole
    train-state pytree (models + optimizer moments + PRNG + step; schedules
    are functions of the step count, so "scheduler state" rides along) PLUS
    a JSON item carrying the train history, the config snapshot, and the
    epoch — so a resume continues the loss curve, not just the weights.
    """

    def __init__(self, directory: str, max_to_keep: int = 3, save_interval: int = 50):
        self.directory = os.path.abspath(directory)
        self.save_interval = max(1, save_interval)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.directory, TRAIN_STATE), options=options
        )
        self._last_saved: int | None = None

    def _save_args(self, epoch: int, state, history=None, config=None,
                   extra=None):
        meta = {
            "epoch": epoch,
            "history": history if history is not None else {},
            "config": _config_meta(config),
            # free-form JSON payload for host-side controller state that
            # must survive kill/resume (e.g. the ReduceLROnPlateau
            # scale/best/bad-epoch counters — schedules.ReduceLROnPlateau)
            "extra": extra if extra is not None else {},
        }
        return ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            meta=ocp.args.JsonSave(meta),
        )

    def maybe_save(self, epoch: int, state, history=None, config=None,
                   extra=None) -> bool:
        """Save when an interval boundary has been CROSSED since the last
        save — robust to callers that only observe chunked epoch counts
        (epoch may jump by epochs_per_call, never landing on an exact
        multiple of save_interval)."""
        prev = self._last_saved if self._last_saved is not None else 0
        if epoch // self.save_interval <= prev // self.save_interval and prev != 0:
            return False
        if epoch < self.save_interval:
            return False
        # copy: saves are async and training loops donate the live state
        state = jax.tree.map(jnp.copy, state)
        self._mgr.save(
            epoch, args=self._save_args(epoch, state, history, config, extra),
            force=True,
        )
        self._last_saved = epoch
        return True

    def save(self, epoch: int, state, history=None, config=None,
             extra=None) -> None:
        self._mgr.save(
            epoch, args=self._save_args(epoch, state, history, config, extra),
            force=True,
        )
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_template, epoch: int | None = None):
        """Returns (epoch, state) — see `restore_with_meta` for the full
        payload."""
        step, state, _ = self.restore_with_meta(state_template, epoch)
        return step, state

    def restore_with_meta(self, state_template, epoch: int | None = None):
        """Returns (epoch, state, meta) where meta carries
        {'epoch', 'history', 'config'} as saved."""
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            return None, None, None
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
        if not self._has_composite_layout(step):
            # legacy layout (pre-composite revisions saved the bare state
            # pytree as the single default item) — restore it and synthesize
            # empty meta so old run directories remain resumable
            state = self._mgr.restore(step, args=ocp.args.StandardRestore(target))
            return step, state, {
                "epoch": step, "history": {}, "config": None, "extra": {},
            }
        restored = self._mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(target),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return step, restored["state"], restored["meta"]

    def _has_composite_layout(self, step: int) -> bool:
        """True when the step directory holds the Composite ('state','meta')
        items this class writes; False for checkpoints written by earlier
        revisions (plain StandardSave)."""
        step_dir = os.path.join(self.directory, TRAIN_STATE, str(step))
        return os.path.isdir(os.path.join(step_dir, "state"))

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()
