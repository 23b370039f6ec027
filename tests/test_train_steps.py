"""Train-step tests: convergence, parity semantics (detach_forward), GAN
update ordering, determinism, and all trainer-mode settings variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu.data import gather_batch
from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.train.state import (
    init_forward_state,
    init_pigan_state,
    make_optimizers,
)
from pigan_thz_tpu.train.steps import (
    ForwardStepSettings,
    StepSettings,
    make_epoch_fn,
    make_forward_step,
    make_pigan_step,
)


@pytest.fixture(scope="module")
def system(cfg, small_ds):
    g, d, f = build_trio(cfg)
    spe = small_ds.num_samples // cfg.train.batch_size
    g_tx, d_tx, f_tx = make_optimizers(cfg, spe)
    return g, d, f, g_tx, d_tx, f_tx


def test_forward_pretrain_converges(system, small_ds, cfg):
    g, d, f, g_tx, d_tx, f_tx = system
    fs = init_forward_state(f, f_tx, jax.random.PRNGKey(0))
    epoch = make_epoch_fn(make_forward_step(f, f_tx), cfg.train.batch_size)
    fs, m0 = epoch(fs, small_ds, jax.random.PRNGKey(1))
    for e in range(9):
        fs, m = epoch(fs, small_ds, jax.random.PRNGKey(2 + e))
    assert float(m["loss"]) < float(m0["loss"]) * 0.5
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_forward_step_settings_variants(system, small_ds, cfg):
    g, d, f, g_tx, d_tx, f_tx = system
    batch = gather_batch(small_ds, jnp.arange(cfg.train.batch_size))
    for st in (
        ForwardStepSettings(),                                    # pretrain
        ForwardStepSettings(spectrum_w=5, metrics_w=2, smoothness_w=0.5),  # phase1
        ForwardStepSettings(l1_w=0.5),                            # emergency
    ):
        fs = init_forward_state(f, f_tx, jax.random.PRNGKey(0))
        step = make_forward_step(f, f_tx, st)
        fs, m = jax.jit(step)(fs, batch)
        assert np.isfinite(float(m["loss"]))


def test_pigan_step_runs_and_updates_both(system, small_ds, cfg):
    g, d, f, g_tx, d_tx, f_tx = system
    ps = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(0))
    step = make_pigan_step(
        g, d, f, g_tx, d_tx, StepSettings(), small_ds.param_lo, small_ds.param_hi
    )
    batch = gather_batch(small_ds, jnp.arange(cfg.train.batch_size))
    ps2, m = jax.jit(step)(ps, batch, 1.0)
    # both G and D params changed
    gd = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                                ps.g.params, ps2.g.params)
    dd = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                                ps.d.params, ps2.d.params)
    assert max(jax.tree_util.tree_leaves(gd)) > 0
    assert max(jax.tree_util.tree_leaves(dd)) > 0
    # F frozen (train_pigan.py:75)
    fd = jax.tree_util.tree_map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                                ps.f.params, ps2.f.params)
    assert max(jax.tree_util.tree_leaves(fd)) == 0
    assert int(ps2.step) == 1
    for k, v in m.items():
        assert np.isfinite(float(v)), k


@pytest.mark.slow
def test_detach_forward_blocks_physics_gradients(system, small_ds, cfg):
    """Parity check for the reference's no_grad quirk (train_pigan.py:156):
    with detach_forward=True and only the F-mediated losses enabled (recon,
    metrics, maxwell), G's gradient must be exactly zero; with
    detach_forward=False it must be nonzero.  NOTE lc_w must be 0 here: the
    LC loss's theoretical term is a direct function of G's output
    (loss.py:91-92), so it carries gradient into G even under no_grad."""
    g, d, f, g_tx, d_tx, f_tx = system
    batch = gather_batch(small_ds, jnp.arange(cfg.train.batch_size))
    base = dict(adv_w=0.0, recon_w=1.0, physics_spec_w=0.0, physics_metrics_w=1.0,
                maxwell_w=1.0, lc_w=0.0, range_w=0.0)

    def g_update_norm(detach):
        ps = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(0))
        step = make_pigan_step(
            g, d, f, g_tx, d_tx,
            StepSettings(detach_forward=detach, **base),
            small_ds.param_lo, small_ds.param_hi,
        )
        ps2, _ = jax.jit(step)(ps, batch, 1.0)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))), ps.g.params, ps2.g.params
        )
        return max(jax.tree_util.tree_leaves(diffs))

    assert g_update_norm(True) == 0.0
    assert g_update_norm(False) > 0.0


@pytest.mark.slow
def test_all_trainer_mode_settings(system, small_ds, cfg):
    """Every reference trainer variant maps to a StepSettings; each must
    produce finite losses in one fused step."""
    g, d, f, g_tx, d_tx, f_tx = system
    batch = gather_batch(small_ds, jnp.arange(cfg.train.batch_size))
    variants = {
        "train_pigan": StepSettings(),
        "unified": StepSettings(constraint_w=3.0, stability_w=1.0, window_w=2.0,
                                detach_forward=False),
        "constraint": StepSettings(constraint_w=3.0, cycle_w=1.0, detach_forward=False),
        "constraint_optimizer": StepSettings(sigmoid_squash=True, constraint_w=50.0,
                                             d_update_every=3),
        "emergency_warmup": StepSettings(adv_w=0.1, d_update_every=2),
    }
    for name, st in variants.items():
        ps = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(1))
        step = make_pigan_step(g, d, f, g_tx, d_tx, st,
                               small_ds.param_lo, small_ds.param_hi)
        ps, m = jax.jit(step)(ps, batch, 1.0)
        for k, v in m.items():
            assert np.isfinite(float(v)), f"{name}:{k}"


def test_d_update_every_skips(system, small_ds, cfg):
    g, d, f, g_tx, d_tx, f_tx = system
    batch = gather_batch(small_ds, jnp.arange(cfg.train.batch_size))
    ps = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(0))
    step = jax.jit(make_pigan_step(
        g, d, f, g_tx, d_tx, StepSettings(d_update_every=2),
        small_ds.param_lo, small_ds.param_hi,
    ))
    # step 0: D updates (0 % 2 == 0); step 1: D frozen
    ps1, _ = step(ps, batch, 1.0)
    ps2, _ = step(ps1, batch, 1.0)
    d01 = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ps.d.params, ps1.d.params)))
    d12 = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ps1.d.params, ps2.d.params)))
    assert d01 > 0.0 and d12 == 0.0


def test_epoch_determinism(system, small_ds, cfg):
    g, d, f, g_tx, d_tx, f_tx = system
    step = make_pigan_step(g, d, f, g_tx, d_tx, StepSettings(),
                           small_ds.param_lo, small_ds.param_hi)
    epoch = make_epoch_fn(step, cfg.train.batch_size, with_scale=True)

    def run():
        ps = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(3))
        ps, m = epoch(ps, small_ds, jax.random.PRNGKey(4))
        return float(m["g_loss"])

    assert run() == run()


@pytest.mark.slow
def test_gan_losses_decrease_over_epochs(system, small_ds, cfg):
    """End-to-end sanity: after forward pretrain, a few GAN epochs reduce the
    spectrum reconstruction loss."""
    g, d, f, g_tx, d_tx, f_tx = system
    fs = init_forward_state(f, f_tx, jax.random.PRNGKey(0))
    fepoch = make_epoch_fn(make_forward_step(f, f_tx), cfg.train.batch_size)
    for e in range(10):
        fs, _ = fepoch(fs, small_ds, jax.random.PRNGKey(10 + e))
    ps = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(1),
                          forward_variables=fs.f.variables)
    step = make_pigan_step(g, d, f, g_tx, d_tx,
                           StepSettings(detach_forward=False),
                           small_ds.param_lo, small_ds.param_hi)
    epoch = make_epoch_fn(step, cfg.train.batch_size, with_scale=True)
    first = None
    for e in range(8):
        ps, m = epoch(ps, small_ds, jax.random.PRNGKey(30 + e))
        if first is None:
            first = float(m["recon_spec_loss"])
    assert float(m["recon_spec_loss"]) < first
