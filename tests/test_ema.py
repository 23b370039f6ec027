"""Generator-EMA track: update math, opt-in structure, evaluator wiring.

New capability (no reference counterpart): `StepSettings.ema_decay` keeps an
exponential moving average of the generator params inside the fused step
(train/steps.py); `Trainer.evaluate(use_ema=True)` scores it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu.data.dataset import gather_batch
from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.train import (
    StepSettings,
    Trainer,
    init_pigan_state,
    make_optimizers,
    make_pigan_step,
)


def _batch(ds, n=16):
    return gather_batch(ds, jnp.arange(n))


def test_ema_update_math(cfg, small_ds):
    """g_ema after two steps equals the hand-computed lerp of the param
    trajectory."""
    g, d, f = build_trio(cfg)
    g_tx, d_tx, _ = make_optimizers(cfg, 4)
    state = init_pigan_state(
        g, d, f, g_tx, d_tx, jax.random.PRNGKey(0), ema=True
    )
    mu = 0.5
    step = jax.jit(make_pigan_step(
        g, d, f, g_tx, d_tx,
        StepSettings.from_config(cfg, ema_decay=mu),
        small_ds.param_lo, small_ds.param_hi,
    ))
    p0 = state.g.params
    state1, _ = step(state, _batch(small_ds))
    p1 = state1.g.params
    expect1 = jax.tree.map(lambda e, p: mu * e + (1 - mu) * p, p0, p1)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
        state1.g_ema, expect1,
    )
    state2, _ = step(state1, _batch(small_ds))
    expect2 = jax.tree.map(
        lambda e, p: mu * e + (1 - mu) * p, expect1, state2.g.params
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
        state2.g_ema, expect2,
    )


def test_ema_off_keeps_legacy_structure(cfg, small_ds):
    """Default (ema_decay=0) states carry g_ema=None — identical pytree
    leaf structure to pre-EMA revisions, so old checkpoints keep restoring."""
    g, d, f = build_trio(cfg)
    g_tx, d_tx, _ = make_optimizers(cfg, 4)
    state = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(0))
    assert state.g_ema is None
    step = jax.jit(make_pigan_step(
        g, d, f, g_tx, d_tx, StepSettings.from_config(cfg),
        small_ds.param_lo, small_ds.param_hi,
    ))
    state, _ = step(state, _batch(small_ds))
    assert state.g_ema is None


def test_ema_requires_ema_state(cfg, small_ds):
    g, d, f = build_trio(cfg)
    g_tx, d_tx, _ = make_optimizers(cfg, 4)
    state = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(0))
    step = make_pigan_step(
        g, d, f, g_tx, d_tx,
        StepSettings.from_config(cfg, ema_decay=0.9),
        small_ds.param_lo, small_ds.param_hi,
    )
    with pytest.raises(ValueError, match="ema"):
        step(state, _batch(small_ds))


@pytest.mark.slow
def test_trainer_ema_evaluation(cfg, small_ds, tmp_path):
    """Trainer auto-seeds the EMA track and evaluates it; the EMA generator
    differs from the live one after training, and round-trips through the
    'generator_ema' final artifact."""
    t = Trainer(cfg, ds=small_ds, epochs_per_call=2)
    t.pretrain_forward(epochs=2, log_every=10**9)
    t.init_pigan()
    t.train_pigan(
        epochs=2, log_every=10**9,
        settings=StepSettings.from_config(cfg, ema_decay=0.99),
    )
    st = t.pigan_state
    assert st.g_ema is not None
    diffs = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(jnp.sum(jnp.abs(a - b))),
                     st.g_ema, st.g.params)
    )
    assert sum(diffs) > 0.0
    res = t.evaluate(use_ema=True)
    assert np.isfinite(res["pigan_evaluation"]["parameter_prediction"]["r2"])

    # artifact round trip: save_final writes generator_ema, load_final
    # restores it into g_ema
    t.save_final(str(tmp_path))
    t3 = Trainer(cfg, ds=small_ds)
    t3.load_final(str(tmp_path))
    assert t3.pigan_state.g_ema is not None
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        t3.pigan_state.g_ema, st.g_ema,
    )

    # without an EMA track, use_ema must fail loudly
    t2 = Trainer(cfg, ds=small_ds)
    t2.init_pigan()
    with pytest.raises(ValueError, match="EMA"):
        t2.evaluator(use_ema=True)


@pytest.mark.slow
def test_ema_periodic_checkpoint_resume(cfg, small_ds, tmp_path):
    """Periodic checkpoints saved mid-EMA-run restore into a FRESH trainer
    whose template has no EMA subtree (resume_from retries with the toggled
    template), and vice versa."""
    from pigan_thz_tpu.train import checkpoint as ckpt

    t = Trainer(cfg, ds=small_ds, epochs_per_call=2)
    t.pretrain_forward(epochs=1, log_every=10**9)
    t.init_pigan()
    t.train_pigan(epochs=2, log_every=10**9,
                  settings=StepSettings.from_config(cfg, ema_decay=0.9))
    mgr = ckpt.CheckpointManager(str(tmp_path / "ck"), max_to_keep=1,
                                 save_interval=1)
    mgr.save(2, t.pigan_state, history=t.train_history, config=cfg)
    mgr.close()

    t2 = Trainer(cfg, ds=small_ds)
    mgr2 = ckpt.CheckpointManager(str(tmp_path / "ck"), max_to_keep=1,
                                  save_interval=1)
    step = t2.resume_from(mgr2, "pigan")  # plain template vs EMA checkpoint
    assert step == 2
    assert t2.pigan_state.g_ema is not None
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        t2.pigan_state.g_ema, t.pigan_state.g_ema,
    )
    mgr2.close()


def test_ensemble_ema_track(cfg, small_ds):
    """EMA composes with the vmapped ensemble: every member keeps its own
    EMA track through the shared runtime-weights step."""
    from pigan_thz_tpu.parallel.ensemble import (
        EnsembleSettings,
        init_ensemble_states,
        make_ensemble_epoch_fn,
        make_ensemble_pigan_step,
        weight_vector,
    )

    g, d, f = build_trio(cfg)
    g_tx, d_tx, _ = make_optimizers(cfg, 4)
    states = init_ensemble_states(
        g, d, f, g_tx, d_tx, 2, jax.random.PRNGKey(0), ema=True
    )
    step = make_ensemble_pigan_step(
        g, d, f, g_tx, d_tx, EnsembleSettings(),
        small_ds.param_lo, small_ds.param_hi,
        step_settings=StepSettings.from_config(cfg, ema_decay=0.9),
    )
    epoch = make_ensemble_epoch_fn(step, cfg.train.batch_size)
    weights = jnp.stack([weight_vector(), weight_vector(recon=50.0)])
    states, _ = epoch(states, small_ds, jax.random.PRNGKey(1), weights)
    assert states.g_ema is not None
    # members diverge, so their EMA tracks must differ
    leaves = jax.tree.leaves(states.g_ema)
    assert all(x.shape[0] == 2 for x in leaves)
    diff = sum(float(jnp.sum(jnp.abs(x[0] - x[1]))) for x in leaves)
    assert diff > 0.0
