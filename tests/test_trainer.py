"""Trainer / programs / checkpoint integration tests (kept small: a few
epochs on a 256-sample synthetic set)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu import default_config
from pigan_thz_tpu.config import DataConfig
from pigan_thz_tpu.train import Trainer, checkpoint as ckpt
from pigan_thz_tpu.train.programs import (
    Phase,
    constraint_finetune_phase,
    progressive_pipeline,
    run_program,
)
from pigan_thz_tpu.train.steps import ForwardStepSettings, StepSettings

pytestmark = pytest.mark.slow  # end-to-end training tier


@pytest.fixture(scope="module")
def trainer(cfg, small_ds):
    t = Trainer(cfg, ds=small_ds)
    t.pretrain_forward(epochs=8, log_every=100)
    t.init_pigan()
    t.train_pigan(epochs=3, log_every=100)
    return t


def test_history_recorded(trainer):
    assert len(trainer.train_history["forward/loss"]) == 8
    assert len(trainer.train_history["pigan/g_loss"]) == 3
    assert all(np.isfinite(v) for v in trainer.train_history["pigan/g_loss"])


def test_mode_dispatch(cfg, small_ds):
    t = Trainer(cfg, ds=small_ds)
    t.train(mode="forward_only", epochs=2, log_every=100)
    assert t.forward_state is not None
    with pytest.raises(ValueError):
        t.train(mode="bogus")


def test_final_artifact_contract(trainer, tmp_path):
    """The trainer<->evaluator artifact contract the reference unit-tests via
    source grep (test_unified_training.py:99-135), exercised for real."""
    d = str(tmp_path / "saved_models")
    trainer.save_final(d)
    for name in (
        ckpt.GENERATOR_FINAL,
        ckpt.DISCRIMINATOR_FINAL,
        ckpt.FORWARD_MODEL_FINAL,
        ckpt.FORWARD_MODEL_PRETRAINED,
    ):
        assert ckpt.exists(d, name), name
    r2a = trainer.evaluate()["pigan_evaluation"]["parameter_prediction"]["r2"]
    t2 = Trainer(trainer.cfg, ds=trainer.ds)
    t2.load_final(d)
    r2b = t2.evaluate()["pigan_evaluation"]["parameter_prediction"]["r2"]
    assert r2a == pytest.approx(r2b, abs=1e-6)


def test_checkpoint_manager_resume(trainer, tmp_path):
    mgr = ckpt.CheckpointManager(str(tmp_path / "ck"), save_interval=1)
    mgr.save(3, trainer.pigan_state)
    step, restored = mgr.restore(trainer.pigan_state)
    assert step == 3
    orig = jax.tree_util.tree_leaves(trainer.pigan_state.g.params)
    rest = jax.tree_util.tree_leaves(restored.g.params)
    for a, b in zip(orig, rest):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_snapshot_restore_keeps_best(cfg, small_ds):
    """With per-epoch snapshots (epochs_per_call=1), the restored state must
    differ from the plain run's final state whenever the best epoch is not
    the last one — proving the best-epoch copy/restore actually happens
    (both runs are fully deterministic with identical seeds)."""
    def run(snapshot):
        t = Trainer(cfg, ds=small_ds, epochs_per_call=1)
        t.init_pigan()
        t.train_pigan(epochs=4, log_every=100,
                      snapshot_metric="g_loss" if snapshot else None,
                      snapshot_mode="min")
        return t

    plain = run(snapshot=False)
    snap = run(snapshot=True)
    history = snap.train_history["pigan/g_loss"]
    best_epoch = int(np.argmin(history))
    max_diff = max(
        jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            plain.pigan_state.g.params, snap.pigan_state.g.params,
        ))
    )
    if best_epoch == len(history) - 1:
        assert max_diff == 0.0  # best is last -> states identical
    else:
        assert max_diff > 0.0   # restore rolled back to the best epoch


def test_program_gates_skip_when_healthy(cfg, small_ds):
    """A gate whose predicate fails must skip its phase."""
    t = Trainer(cfg, ds=small_ds)
    t.pretrain_forward(epochs=2, log_every=100)
    t.init_pigan()
    t.train_pigan(epochs=1, log_every=100)
    phases = [
        Phase(name="never", kind="gan", epochs=1,
              gate=lambda ev: False),
        Phase(name="always", kind="gan", epochs=1),
    ]
    res = run_program(t, phases, log_every=100)
    assert res.phases_skipped == ["never"]
    assert res.phases_run == ["always"]


def test_constraint_finetune_reduces_violation(cfg, small_ds):
    t = Trainer(cfg, ds=small_ds)
    t.pretrain_forward(epochs=5, log_every=100)
    t.init_pigan()
    t.train_pigan(epochs=2, log_every=100)
    before = t.evaluate()["structural_prediction_evaluation"][
        "param_range_violation_rate"
    ]
    run_program(t, [constraint_finetune_phase(epochs=4)], log_every=100)
    after = t.evaluate()["structural_prediction_evaluation"][
        "param_range_violation_rate"
    ]
    assert after <= before


def test_per_phase_optimizer_override(cfg, small_ds):
    """Per-mode LR/scheduler policies (unified_constraint_trainer.py:196-214)."""
    t = Trainer(cfg, ds=small_ds, epochs_per_call=2)
    t.init_pigan()
    t.train_pigan(epochs=2, log_every=100, lr_d=5e-5, schedule_g="linear")
    assert np.isfinite(t.train_history["pigan/g_loss"][-1])


def test_violation_window_modes(cfg, small_ds):
    t = Trainer(cfg, ds=small_ds)
    t.init_pigan()
    parity = t.evaluate()["structural_prediction_evaluation"][
        "param_range_violation_rate"]
    sane = t.evaluate(violation_window=(-1.0, 1.0))[
        "structural_prediction_evaluation"]["param_range_violation_rate"]
    # tanh outputs never leave [-1,1]; the parity window reports more
    assert sane == 0.0
    assert parity >= sane


@pytest.mark.parametrize("fname", ["mlp", "branched", "physics", "uncertainty"])
def test_every_forward_variant_trains(cfg, small_ds, fname):
    """Every registry forward-model variant pretrains through the Trainer
    and serves as the frozen F of the GAN step (round-2 VERDICT: the
    uncertainty variant crashed on the 2-tuple unpack at the _apply
    boundary; means now lead the output for every variant)."""
    import dataclasses

    c = cfg.replace(
        forward_model=dataclasses.replace(cfg.forward_model, name=fname)
    )
    t = Trainer(c, ds=small_ds, epochs_per_call=1, megakernel="off")
    t.pretrain_forward(epochs=1, log_every=10**9)
    assert np.isfinite(t.train_history["forward/loss"][-1])
    t.init_pigan()
    t.train_pigan(epochs=1, log_every=10**9)
    assert np.isfinite(t.train_history["pigan/g_loss"][-1])


def test_uncertainty_nll_trains_variance_heads(cfg, small_ds):
    """ForwardStepSettings.nll_w trains the variance heads: after a few
    NLL epochs the predicted variances correlate with the actual squared
    errors direction-wise (loss decreases, variances finite+positive),
    and nll_w on a 2-tuple model raises."""
    import dataclasses

    c = cfg.replace(
        forward_model=dataclasses.replace(cfg.forward_model, name="uncertainty")
    )
    t = Trainer(c, ds=small_ds, epochs_per_call=2, megakernel="off")
    t.pretrain_forward(
        epochs=4, settings=ForwardStepSettings(nll_w=1.0), log_every=10**9
    )
    hist = t.train_history["forward/loss"]
    assert np.isfinite(hist).all() and hist[-1] < hist[0]
    out = t.forward_model.apply(
        t.forward_state.f.variables, small_ds.params_norm[:8]
    )
    assert len(out) == 4
    assert np.all(np.asarray(out[2]) > 0) and np.all(np.asarray(out[3]) > 0)

    t2 = Trainer(cfg, ds=small_ds, epochs_per_call=1, megakernel="off")
    with pytest.raises(ValueError, match="variance heads"):
        t2.pretrain_forward(epochs=1, settings=ForwardStepSettings(nll_w=1.0))


def test_backup_tag_artifacts(cfg, small_ds, tmp_path):
    """save_final(backup_tag=...) writes per-mode versioned copies next to
    the finals (reference *_unified/_emergency.pth parity)."""
    t = Trainer(cfg, ds=small_ds, epochs_per_call=1, megakernel="off")
    t.init_pigan()
    t.train_pigan(epochs=1, log_every=10**9)
    t.save_final(str(tmp_path), backup_tag="emergency")
    import os as _os

    for n in ("generator_final", "generator_emergency",
              "discriminator_emergency", "forward_model_emergency"):
        assert _os.path.isdir(_os.path.join(str(tmp_path), n)), n


def test_per_chunk_progress_eta(cfg, small_ds):
    """VERDICT r3 #7: each chunked jit call logs a steps/s + ETA line (the
    chunk-granular counterpart of the reference's in-epoch progress bar)."""
    from pigan_thz_tpu.train import Trainer

    class _Log:
        def __init__(self):
            self.lines = []

        def info(self, msg):
            self.lines.append(msg)

        def add_scalars(self, *a, **k):
            pass

    log = _Log()
    t = Trainer(cfg, ds=small_ds, epochs_per_call=2, logger=log)
    t.pretrain_forward(epochs=4, log_every=10**9)
    prog = [l for l in log.lines if "ETA" in l and "[forward]" in l]
    assert len(prog) == 2                       # one line per chunk
    assert "epoch 2/4" in prog[0] and "epoch 4/4" in prog[1]
    # first chunk's window includes jit compile and says so; later chunks
    # rebase to post-compile time (review r4: a cumulative window deflated
    # every line by the first compile's minutes)
    assert "(incl. compile)" in prog[0]
    assert "(incl. compile)" not in prog[1]
    t.init_pigan()
    t.train_pigan(epochs=2, log_every=10**9)
    assert any(
        "steps/s (incl. compile), ETA" in l and "[pigan]" in l
        for l in log.lines
    )


# ---------------------------------------------------------------------------
# ReduceLROnPlateau (round 5 — VERDICT r4 #3)
# ---------------------------------------------------------------------------


def test_plateau_controller_matches_torch():
    """Value-for-value golden test against
    torch.optim.lr_scheduler.ReduceLROnPlateau on random metric sequences
    (the reference drives its emergency LR with exactly this scheduler,
    emergency_trainer.py:131-133)."""
    import numpy as np

    torch = pytest.importorskip("torch")
    from pigan_thz_tpu.train.schedules import ReduceLROnPlateau

    rng = np.random.default_rng(42)
    for case in range(6):
        kwargs = dict(
            factor=[0.5, 0.1, 0.3][case % 3],
            patience=[3, 0, 5][case % 3],
            threshold=[1e-4, 1e-2, 0.0][case % 3],
            threshold_mode=["rel", "abs"][case % 2],
            cooldown=[0, 2][case % 2],
            mode=["min", "max"][case // 3],
        )
        base_lr = 5e-4
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.Adam([p], lr=base_lr)
        ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, min_lr=0.0, eps=1e-8, **kwargs
        )
        ours = ReduceLROnPlateau(min_scale=0.0, eps=1e-8, base_lr=base_lr,
                                 **kwargs)
        # plateau-y sequence: noisy decrease then flat
        seq = np.concatenate([
            1.0 / (1 + np.arange(20)) + rng.normal(0, 0.01, 20),
            np.full(40, 0.05) + rng.normal(0, 1e-5, 40),
        ])
        for v in seq:
            ref.step(float(v))
            scale = ours.step(float(v))
            assert scale * base_lr == pytest.approx(
                opt.param_groups[0]["lr"], rel=1e-9
            ), f"case {kwargs}"


def test_plateau_state_dict_roundtrip():
    from pigan_thz_tpu.train.schedules import ReduceLROnPlateau

    a = ReduceLROnPlateau(factor=0.5, patience=2)
    for v in [1.0, 1.0, 1.0, 1.0, 1.0, 0.5, 0.5]:
        a.step(v)
    b = ReduceLROnPlateau(factor=0.5, patience=2)
    b.load_state_dict(a.state_dict())
    for v in [0.5] * 5:
        assert a.step(v) == b.step(v)
    assert a.state_dict() == b.state_dict()


def test_pretrain_forward_plateau_reduces_lr(cfg, small_ds):
    """A plateauing forward loss must halve the LR scale and the reduced
    scale must reach the compiled step (recorded per epoch in
    forward/lr_scale; applied from the next chunk)."""
    from pigan_thz_tpu.train.schedules import ReduceLROnPlateau

    t = Trainer(cfg, ds=small_ds, epochs_per_call=2, megakernel="off")
    # patience 0 + huge threshold: every epoch counts as "no improvement"
    # after the first, so reductions fire fast enough for a short test
    ctl = ReduceLROnPlateau(factor=0.5, patience=0, threshold=10.0,
                            threshold_mode="abs")
    t.pretrain_forward(epochs=8, lr=1e-3, schedule="constant", plateau=ctl)
    scales = t.train_history["forward/lr_scale"]
    assert len(scales) == 8
    assert scales[0] == 1.0
    assert ctl.num_reductions >= 2
    assert ctl.scale < 0.5
    # chunk-granular application: epochs 2..3 ran at the scale the
    # controller held after epoch 1's observation
    assert scales[2] < 1.0


def test_plateau_state_rides_checkpoint(tmp_path, cfg, small_ds):
    from pigan_thz_tpu.train import checkpoint as ckpt
    from pigan_thz_tpu.train.schedules import ReduceLROnPlateau

    t = Trainer(cfg, ds=small_ds, epochs_per_call=2, megakernel="off")
    ctl = ReduceLROnPlateau(factor=0.5, patience=0, threshold=10.0,
                            threshold_mode="abs")
    mgr = ckpt.CheckpointManager(str(tmp_path), save_interval=2)
    t.pretrain_forward(epochs=4, lr=1e-3, schedule="constant", plateau=ctl,
                       checkpoint_manager=mgr)
    mgr._mgr.wait_until_finished()
    step, _, meta = mgr.restore_with_meta(t.forward_state)
    assert meta["extra"]["plateau"]["scale"] == ctl.state_dict()["scale"] or \
        meta["extra"]["plateau"]["num_reductions"] <= ctl.num_reductions
    fresh = ReduceLROnPlateau(factor=0.5, patience=0, threshold=10.0,
                              threshold_mode="abs")
    fresh.load_state_dict(meta["extra"]["plateau"])
    assert fresh.scale <= 1.0


def test_plateau_resumes_from_checkpoint_after_kill(tmp_path, cfg, small_ds):
    """Kill/resume: a FRESH Trainer + pristine controller + the same
    checkpoint dir must resume the reduced LR scale instead of silently
    restarting at the pre-plateau LR (review r5)."""
    from pigan_thz_tpu.train import checkpoint as ckpt
    from pigan_thz_tpu.train.schedules import ReduceLROnPlateau

    t = Trainer(cfg, ds=small_ds, epochs_per_call=2, megakernel="off")
    ctl = ReduceLROnPlateau(factor=0.5, patience=0, threshold=10.0,
                            threshold_mode="abs")
    mgr = ckpt.CheckpointManager(str(tmp_path), save_interval=2)
    t.pretrain_forward(epochs=4, lr=1e-3, schedule="constant", plateau=ctl,
                       checkpoint_manager=mgr)
    mgr._mgr.wait_until_finished()
    assert ctl.scale < 1.0
    # "kill": fresh Trainer session; realistic resume = restore state +
    # history from the manager (the full_pipeline chunk-resume pattern),
    # then continue with a PRISTINE controller — the auto-restore must
    # pick the saved plateau state up
    t2 = Trainer(cfg, ds=small_ds, epochs_per_call=2, megakernel="off")
    t2.pretrain_forward(epochs=0, lr=1e-3, schedule="constant")  # init only
    mgr2 = ckpt.CheckpointManager(str(tmp_path), save_interval=2)
    step, state, meta = mgr2.restore_with_meta(t2.forward_state)
    t2.forward_state = state
    t2.train_history = dict(meta["history"])
    ctl2 = ReduceLROnPlateau(factor=0.5, patience=0, threshold=10.0,
                             threshold_mode="abs")
    t2.pretrain_forward(epochs=2, lr=1e-3, schedule="constant", plateau=ctl2,
                        checkpoint_manager=mgr2)
    scales = t2.train_history["forward/lr_scale"][step:]
    assert scales[0] < 1.0          # resumed scale applied from chunk 0
    mgr2._mgr.wait_until_finished()
    # a caller-warmed controller is NOT overwritten by the auto-restore
    ctl3 = ReduceLROnPlateau(factor=0.5, patience=0)
    ctl3.step(0.123)                # observed something -> not pristine
    t3 = Trainer(cfg, ds=small_ds, epochs_per_call=2, megakernel="off")
    t3.pretrain_forward(epochs=0, lr=1e-3, schedule="constant")
    mgr3 = ckpt.CheckpointManager(str(tmp_path), save_interval=2)
    _, state3, meta3 = mgr3.restore_with_meta(t3.forward_state)
    t3.forward_state = state3
    t3.train_history = dict(meta3["history"])
    t3.pretrain_forward(epochs=2, lr=1e-3, schedule="constant", plateau=ctl3,
                        checkpoint_manager=mgr3)
    assert ctl3.best == pytest.approx(0.123)
