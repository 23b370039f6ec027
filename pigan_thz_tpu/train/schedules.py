"""Optimizer + LR schedule builders (optax).

Reference parity (per-epoch torch schedulers re-expressed per optimizer step):
- G: Adam(2e-4, betas=(0.5, 0.999)) + CosineAnnealingLR(T_max=num_epochs,
  eta_min=lr*0.01)  (train_pigan.py:56,61);
- D: Adam(2e-4) + StepLR(step_size=num_epochs//4, gamma=0.5)
  (train_pigan.py:57,62);
- F pretrain: Adam(1e-3) + CosineAnnealingLR(T_max=epochs, eta_min=0)
  (pretrain_fwd_model.py:44-48);
- all three clip grads to global-norm 1.0 (train_pigan.py:142,186).

With steps_per_epoch compiled in, a per-step schedule traces the exact same
curve the torch per-epoch scheduler follows at epoch boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..config import OptimizerConfig


def scale_by_adam_bf16(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
) -> optax.GradientTransformation:
    """`optax.scale_by_adam` with BOTH moments stored in bfloat16.

    The recurrence computes in fp32 and rounds the stored m/v to bf16 each
    step (the update uses the pre-rounding fp32 values); parameters stay
    fp32.  This is the XLA-path twin of the megakernel's
    adam_state_dtype="bfloat16" mode, so the two backends stay
    trajectory-comparable (tests) and checkpoints carry one consistent
    state dtype.  State structure is optax.ScaleByAdamState — packing,
    checkpointing and count bookkeeping are unchanged."""
    inner = optax.scale_by_adam(b1=b1, b2=b2, eps=eps)

    def _cast(tree, dtype):
        return jax.tree.map(lambda x: x.astype(dtype), tree)

    def init(params):
        st = inner.init(params)
        return st._replace(
            mu=_cast(st.mu, jnp.bfloat16), nu=_cast(st.nu, jnp.bfloat16)
        )

    def update(updates, state, params=None):
        st32 = state._replace(
            mu=_cast(state.mu, jnp.float32), nu=_cast(state.nu, jnp.float32)
        )
        new_updates, new_st = inner.update(updates, st32, params)
        return new_updates, new_st._replace(
            mu=_cast(new_st.mu, jnp.bfloat16), nu=_cast(new_st.nu, jnp.bfloat16)
        )

    return optax.GradientTransformation(init, update)


def cosine_schedule(
    base_lr: float, total_epochs: int, steps_per_epoch: int, alpha: float = 0.01
) -> optax.Schedule:
    """CosineAnnealingLR: lr decays to alpha*base_lr over the run."""
    return optax.cosine_decay_schedule(
        init_value=base_lr,
        decay_steps=max(1, total_epochs * steps_per_epoch),
        alpha=alpha,
    )


def step_schedule(
    base_lr: float,
    total_epochs: int,
    steps_per_epoch: int,
    decay_rate: float = 0.5,
    decay_every_frac: float = 0.25,
) -> optax.Schedule:
    """StepLR with step_size = total_epochs * decay_every_frac epochs."""
    every = max(1, int(total_epochs * decay_every_frac) * steps_per_epoch)
    return optax.exponential_decay(
        init_value=base_lr,
        transition_steps=every,
        decay_rate=decay_rate,
        staircase=True,
    )


def linear_schedule(
    base_lr: float, total_epochs: int, steps_per_epoch: int, end_frac: float = 0.1
) -> optax.Schedule:
    """LinearLR analogue used by the constraint trainer's per-mode policies
    (unified_constraint_trainer.py:196-214)."""
    return optax.linear_schedule(
        init_value=base_lr,
        end_value=base_lr * end_frac,
        transition_steps=max(1, total_epochs * steps_per_epoch),
    )


class ReduceLROnPlateau:
    """Metric-reactive LR controller — `torch.optim.lr_scheduler.
    ReduceLROnPlateau` parity, re-expressed for the chunked-scan design.

    The reference's emergency forward recovery drives its LR with this
    scheduler (`emergency_trainer.py:131-133`: factor 0.5, patience 20,
    mode 'min'); defaults here mirror that call.  Because compiled
    schedules are step-count functions, the controller emits a runtime
    *scale* multiplying the compiled schedule instead of mutating an
    optimizer: `step(metric)` is called once per EPOCH (exactly like the
    torch scheduler), and the Trainer applies the latest scale to the
    NEXT epoch chunk — epoch-granular accounting, chunk-granular
    application (the one deviation; chunks default to 25 epochs).

    Semantics matched against torch (mode/threshold_mode/cooldown/eps;
    golden-tested value-for-value in tests/test_trainer.py): a new best
    resets the bad-epoch count; `num_bad > patience` multiplies the scale
    by `factor` (floored at `min_scale`, skipped within `eps`) and starts
    `cooldown` epochs during which bad epochs don't accumulate.

    Host-side state only — `state_dict()`/`load_state_dict()` ride in the
    checkpoint meta JSON so kill/resume preserves the schedule position
    (CheckpointManager `extra=`).
    """

    def __init__(
        self,
        factor: float = 0.5,
        patience: int = 20,
        threshold: float = 1e-4,
        threshold_mode: str = "rel",
        cooldown: int = 0,
        min_scale: float = 0.0,
        mode: str = "min",
        eps: float = 1e-8,
        base_lr: float | None = None,
    ):
        if not 0.0 < factor < 1.0:
            raise ValueError("factor must be in (0, 1)")
        if mode not in ("min", "max"):
            raise ValueError(f"mode {mode!r}: use min | max")
        if threshold_mode not in ("rel", "abs"):
            raise ValueError(f"threshold_mode {threshold_mode!r}: use rel | abs")
        self.factor = float(factor)
        self.patience = int(patience)
        self.threshold = float(threshold)
        self.threshold_mode = threshold_mode
        self.cooldown = int(cooldown)
        self.min_scale = float(min_scale)
        self.mode = mode
        self.eps = float(eps)
        # torch's eps guard compares LR deltas in absolute LR units; give
        # it the base LR the scale multiplies for exact parity (without
        # it the guard applies to the scale itself — same behaviour for
        # any realistically-sized eps)
        self.base_lr = None if base_lr is None else float(base_lr)
        self.scale = 1.0
        self.best = float("inf") if mode == "min" else float("-inf")
        self.num_bad_epochs = 0
        self.cooldown_counter = 0
        self.num_reductions = 0

    def _is_better(self, a: float, best: float) -> bool:
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return a < best * (1.0 - self.threshold)
            return a < best - self.threshold
        if self.threshold_mode == "rel":
            return a > best * (1.0 + self.threshold)
        return a > best + self.threshold

    def step(self, metric: float) -> float:
        """Observe one epoch's metric; returns the (possibly reduced)
        current LR scale."""
        current = float(metric)
        # NaN compares False to everything -> counts as a bad epoch,
        # matching torch's behaviour
        if self._is_better(current, self.best):
            self.best = current
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            new_scale = max(self.scale * self.factor, self.min_scale)
            unit = self.base_lr if self.base_lr is not None else 1.0
            if (self.scale - new_scale) * unit > self.eps:
                self.scale = new_scale
                self.num_reductions += 1
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.scale

    def state_dict(self) -> dict:
        return {
            "scale": self.scale,
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "cooldown_counter": self.cooldown_counter,
            "num_reductions": self.num_reductions,
        }

    def load_state_dict(self, state: dict) -> None:
        self.scale = float(state["scale"])
        self.best = float(state["best"])
        self.num_bad_epochs = int(state["num_bad_epochs"])
        self.cooldown_counter = int(state["cooldown_counter"])
        self.num_reductions = int(state.get("num_reductions", 0))


def make_schedule(
    kind: str,
    lr: float,
    total_epochs: int,
    steps_per_epoch: int,
    schedule_alpha: float = 0.01,
    step_decay_rate: float = 0.5,
    step_decay_every_frac: float = 0.25,
) -> optax.Schedule:
    """The single kind->schedule dispatch (defaults owned HERE): used by
    build_optimizer and by the megakernel's precomputed LR streams, so the
    two paths can never drift."""
    if kind == "cosine":
        return cosine_schedule(lr, total_epochs, steps_per_epoch, schedule_alpha)
    if kind == "warmup_cosine":
        # large-batch recipe (scaled-batch mode, RESULTS.md): linear warmup
        # over the first 5% of steps to the peak LR, then the same cosine
        # decay — the standard stabilizer for LR-scaled large-batch training
        total = max(1, total_epochs * steps_per_epoch)
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=lr,
            warmup_steps=max(1, int(0.05 * total)),
            decay_steps=total,
            end_value=lr * schedule_alpha,
        )
    if kind == "step":
        return step_schedule(
            lr, total_epochs, steps_per_epoch, step_decay_rate,
            step_decay_every_frac,
        )
    if kind == "linear":
        return linear_schedule(lr, total_epochs, steps_per_epoch)
    if kind == "constant":
        return optax.constant_schedule(lr)
    raise ValueError(f"unknown schedule: {kind!r}")


def build_optimizer(
    lr: float,
    total_epochs: int,
    steps_per_epoch: int,
    schedule: str = "cosine",
    b1: float = 0.5,
    b2: float = 0.999,
    eps: float = 1e-8,
    grad_clip: float = 1.0,
    weight_decay: float = 0.0,
    schedule_alpha: float = 0.01,
    step_decay_rate: float = 0.5,
    step_decay_every_frac: float = 0.25,
    adam_state_dtype: str = "float32",
) -> optax.GradientTransformation:
    sched = make_schedule(
        schedule, lr, total_epochs, steps_per_epoch,
        schedule_alpha=schedule_alpha, step_decay_rate=step_decay_rate,
        step_decay_every_frac=step_decay_every_frac,
    )

    if adam_state_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"adam_state_dtype {adam_state_dtype!r}: use float32 | bfloat16"
        )
    if adam_state_dtype == "bfloat16":
        if weight_decay > 0:
            raise ValueError(
                "adam_state_dtype='bfloat16' does not support weight_decay"
            )
        # same (ScaleByAdamState, schedule-state) structure as optax.adam
        adam = optax.chain(
            scale_by_adam_bf16(b1=b1, b2=b2, eps=eps),
            optax.scale_by_learning_rate(sched),
        )
    else:
        adam = (
            optax.adamw(sched, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay)
            if weight_decay > 0
            else optax.adam(sched, b1=b1, b2=b2, eps=eps)
        )
    parts = []
    if grad_clip > 0:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(adam)
    return optax.chain(*parts)


def from_config(
    cfg: OptimizerConfig, total_epochs: int, steps_per_epoch: int
) -> optax.GradientTransformation:
    return build_optimizer(
        lr=cfg.lr,
        total_epochs=total_epochs,
        steps_per_epoch=steps_per_epoch,
        schedule=cfg.schedule,
        b1=cfg.b1,
        b2=cfg.b2,
        eps=cfg.eps,
        grad_clip=cfg.grad_clip,
        weight_decay=cfg.weight_decay,
        schedule_alpha=cfg.schedule_alpha,
        step_decay_rate=cfg.step_decay_rate,
        step_decay_every_frac=cfg.step_decay_every_frac,
    )
