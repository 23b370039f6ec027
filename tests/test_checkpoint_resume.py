"""Checkpoint payload parity: kill/resume reproduces the uninterrupted run.

The reference's full checkpoint carries epoch + models + optimizers +
schedulers + train history + config (unified_constraint_trainer.py:1114-1176).
Here that is the whole state pytree plus a JSON meta item; these tests prove
a mid-stage kill/resume continues the EXACT loss curve (optimizer moments and
PRNG included), not just the weights.
"""

import jax
import numpy as np
import pytest

from pigan_thz_tpu.train import Trainer, checkpoint as ckpt
from pigan_thz_tpu.train.steps import StepSettings

pytestmark = pytest.mark.slow  # end-to-end training tier


def _trees_equal(a, b):
    jax.tree.map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a, b,
    )


def test_forward_kill_resume_reproduces_curve(cfg, small_ds, tmp_path):
    # uninterrupted: two chunked calls on one trainer (pipeline seeding)
    t_ref = Trainer(cfg, ds=small_ds, epochs_per_call=2)
    t_ref.pretrain_forward(epochs=2, seed=0, log_every=10**9)
    t_ref.pretrain_forward(epochs=2, seed=2, log_every=10**9)

    # interrupted: chunk 1 -> save -> FRESH trainer -> resume -> chunk 2
    mgr = ckpt.CheckpointManager(str(tmp_path / "fwd"), save_interval=1)
    t1 = Trainer(cfg, ds=small_ds, epochs_per_call=2)
    t1.pretrain_forward(epochs=2, seed=0, log_every=10**9)
    mgr.save(2, t1.forward_state, history=t1.train_history, config=cfg)

    t2 = Trainer(cfg, ds=small_ds, epochs_per_call=2)
    t2.pretrain_forward(epochs=0)
    assert t2.resume_from(mgr, "forward") == 2
    # history restored: the curve continues, not restarts
    assert t2.train_history["forward/loss"] == t1.train_history["forward/loss"]
    t2.pretrain_forward(epochs=2, seed=2, log_every=10**9)
    mgr.close()

    assert t2.train_history["forward/loss"] == t_ref.train_history["forward/loss"]
    _trees_equal(t2.forward_state.f.params, t_ref.forward_state.f.params)
    # optimizer moments came back too (not reinitialized)
    _trees_equal(t2.forward_state.opt, t_ref.forward_state.opt)


@pytest.mark.slow
def test_pigan_kill_resume_reproduces_curve(cfg, small_ds, tmp_path):
    settings = StepSettings.from_config(cfg, detach_forward=False)

    t_ref = Trainer(cfg, ds=small_ds, epochs_per_call=2)
    t_ref.init_pigan()
    t_ref.train_pigan(epochs=2, settings=settings, seed=0, log_every=10**9)
    t_ref.train_pigan(epochs=2, settings=settings, seed=2, log_every=10**9)

    mgr = ckpt.CheckpointManager(str(tmp_path / "gan"), save_interval=1)
    t1 = Trainer(cfg, ds=small_ds, epochs_per_call=2)
    t1.init_pigan()
    t1.train_pigan(epochs=2, settings=settings, seed=0, log_every=10**9)
    mgr.save(2, t1.pigan_state, history=t1.train_history, config=cfg)

    t2 = Trainer(cfg, ds=small_ds, epochs_per_call=2)
    assert t2.resume_from(mgr, "pigan") == 2
    t2.train_pigan(epochs=2, settings=settings, seed=2, log_every=10**9)
    mgr.close()

    assert t2.train_history["pigan/g_loss"] == t_ref.train_history["pigan/g_loss"]
    assert t2.train_history["pigan/d_loss"] == t_ref.train_history["pigan/d_loss"]
    _trees_equal(t2.pigan_state.g.params, t_ref.pigan_state.g.params)
    _trees_equal(t2.pigan_state.g_opt, t_ref.pigan_state.g_opt)


def test_checkpoint_meta_roundtrip(cfg, small_ds, tmp_path):
    """Config snapshot and epoch survive the JSON roundtrip."""
    mgr = ckpt.CheckpointManager(str(tmp_path / "m"), save_interval=1)
    t = Trainer(cfg, ds=small_ds, epochs_per_call=1)
    t.pretrain_forward(epochs=1, log_every=10**9)
    mgr.save(7, t.forward_state, history=t.train_history, config=cfg)
    step, state, meta = mgr.restore_with_meta(t.forward_state)
    mgr.close()
    assert step == 7 and meta["epoch"] == 7
    assert meta["config"]["data"]["spectrum_dim"] == cfg.data.spectrum_dim
    assert meta["config"]["train"]["batch_size"] == cfg.train.batch_size
    assert len(meta["history"]["forward/loss"]) == 1


def test_legacy_plain_checkpoint_restores(cfg, small_ds, tmp_path):
    """Checkpoints written by earlier revisions (bare StandardSave, no
    Composite state/meta items) must still restore, with synthesized meta."""
    import orbax.checkpoint as ocp

    t = Trainer(cfg, ds=small_ds, epochs_per_call=1)
    t.pretrain_forward(epochs=1, log_every=10**9)

    mgr = ckpt.CheckpointManager(str(tmp_path / "legacy"), save_interval=1)
    # simulate the legacy on-disk layout through the same inner manager
    mgr._mgr.save(3, args=ocp.args.StandardSave(t.forward_state), force=True)
    mgr._mgr.wait_until_finished()

    step, state, meta = mgr.restore_with_meta(t.forward_state)
    mgr.close()
    assert step == 3
    assert meta == {"epoch": 3, "history": {}, "config": None, "extra": {}}
    _trees_equal(state.f.params, t.forward_state.f.params)
    _trees_equal(state.opt, t.forward_state.opt)


def test_save_final_round_trips_train_history(cfg, small_ds, tmp_path):
    """save_final persists the loss curves next to the finals and
    load_final restores them — the evaluate --plot history panel's only
    data source when evaluating a saved-models directory (review r4:
    load_final restores weights only, so the panel was always empty)."""
    t = Trainer(cfg, ds=small_ds, epochs_per_call=1)
    t.init_pigan()
    t.train_history = {"pigan/d_loss": [1.0, 0.5], "pigan/g_loss": [3.0, 2.0]}
    t.save_final(str(tmp_path))

    t2 = Trainer(cfg, ds=small_ds, epochs_per_call=1)
    t2.load_final(str(tmp_path))
    assert t2.train_history == t.train_history
    # an in-progress history is never clobbered by load_final
    t3 = Trainer(cfg, ds=small_ds, epochs_per_call=1)
    t3.train_history = {"pigan/d_loss": [9.9]}
    t3.load_final(str(tmp_path))
    assert t3.train_history == {"pigan/d_loss": [9.9]}


def test_checkpoint_steps_monotonic_across_repeated_calls(cfg, small_ds, tmp_path):
    """Chunk-resumable callers invoke train_pigan repeatedly with one
    CheckpointManager; epochs are call-relative, so checkpoint steps must
    be offset by the epochs already trained or every later call silently
    stops checkpointing (review r4)."""
    t = Trainer(cfg, ds=small_ds, epochs_per_call=2, megakernel="off")
    t.init_pigan()
    mgr = ckpt.CheckpointManager(str(tmp_path / "mono"), save_interval=4)
    t.train_pigan(epochs=4, log_every=10**9, checkpoint_manager=mgr)
    first = mgr._last_saved
    assert first == 4
    t.train_pigan(epochs=4, log_every=10**9, seed=4,
                  checkpoint_manager=mgr)
    assert mgr._last_saved == 8      # second call kept saving, new steps
    mgr.close()
