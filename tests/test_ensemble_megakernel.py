"""Multi-device megakernel seed-ensemble driver (interpret mode, virtual
8-device CPU platform).  The contract under test: member i trained by the
round-robin ensemble driver is BIT-IDENTICAL to the same member trained
alone through make_pallas_multi_epoch_fn on the default device — the
driver adds placement and dispatch, never numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.ops.megakernel import make_pallas_multi_epoch_fn
from pigan_thz_tpu.parallel.ensemble import evaluate_ensemble
from pigan_thz_tpu.parallel.ensemble_megakernel import (
    clamp_epochs_per_call,
    train_seed_ensemble,
)
from pigan_thz_tpu.train import (
    StepSettings,
    init_pigan_state,
    make_optimizers,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.mark.slow
def test_seed_ensemble_bitwise_matches_single_member(cfg, small_ds):
    key = jax.random.PRNGKey(5)
    states, metrics = train_seed_ensemble(
        cfg, small_ds, 2, epochs=2, key=key, epochs_per_call=1,
        interpret=True,
    )
    assert metrics["g_loss"].shape == (2, 2)
    assert all(np.isfinite(v).all() for v in metrics.values())
    # members differ (independent seeds actually trained independently)
    assert not np.array_equal(metrics["g_loss"][0], metrics["g_loss"][1])

    # retrace member 1's exact key chain on the default device
    settings = StepSettings.from_config(cfg)
    g, d, f = build_trio(cfg)
    spe = small_ds.num_samples // cfg.train.batch_size
    g_tx, d_tx, _ = make_optimizers(cfg, spe)
    k_init, k_train = jax.random.split(key)
    st = init_pigan_state(
        g, d, f, g_tx, d_tx, jax.random.fold_in(k_init, 1),
        spectrum_dim=cfg.data.spectrum_dim, param_dim=cfg.data.param_dim,
    )
    cks = jax.random.split(jax.random.fold_in(k_train, 1), 2)
    fn = make_pallas_multi_epoch_fn(cfg, settings, interpret=True)
    ones = jnp.ones((1,), jnp.float32)
    gl = []
    for c in range(2):
        st, m = fn(st, small_ds, cks[c], ones)
        gl.append(float(m["g_loss"][0]))
    np.testing.assert_array_equal(np.array(gl), metrics["g_loss"][1])
    member1 = jax.tree.map(lambda x: np.asarray(x[1]), states.g.variables)
    solo = jax.tree.map(np.asarray, st.g.variables)
    jax.tree.map(np.testing.assert_array_equal, member1, solo)


def test_seed_ensemble_round_robin_and_eval(cfg, small_ds):
    # more members than devices offered: round-robin placement, stacked
    # states feed the existing per-member evaluator unchanged
    states, metrics = train_seed_ensemble(
        cfg, small_ds, 3, epochs=1, key=jax.random.PRNGKey(9),
        devices=jax.devices()[:2], interpret=True,
    )
    assert metrics["d_loss"].shape == (3, 1)
    g, _, f = build_trio(cfg)
    ev = evaluate_ensemble(g, f, states, small_ds)
    assert ev["param_r2"].shape == (3,)
    assert np.isfinite(np.asarray(ev["recon_mse"])).all()


def test_clamp_epochs_per_call():
    from pigan_thz_tpu.ops import megakernel as MK

    assert clamp_epochs_per_call(25, 4) == 25
    big_spe = MK._MAX_PROGRAM_GRID  # one epoch fills the whole program
    assert clamp_epochs_per_call(25, big_spe) == 1


def test_settings_sweep_controlled_arms(cfg, small_ds):
    """Arms share init + shuffle keys: identical settings -> bitwise
    identical outcomes, even when both arms round-robin onto ONE device
    (the donated-state aliasing guard); a changed loss surface -> a
    different outcome plus its extra metric key."""
    import dataclasses

    from pigan_thz_tpu.parallel.ensemble_megakernel import train_settings_sweep

    s = StepSettings.from_config(cfg)
    s_con = dataclasses.replace(s, constraint_w=1.0)
    states, ms = train_settings_sweep(
        cfg, small_ds, [s, s, s_con], epochs=1, key=jax.random.PRNGKey(2),
        devices=jax.devices()[:1], interpret=True,
    )
    assert ms[0]["g_loss"].shape == (1,)
    np.testing.assert_array_equal(ms[0]["g_loss"], ms[1]["g_loss"])
    arm0 = jax.tree.map(lambda x: np.asarray(x[0]), states.g.variables)
    arm1 = jax.tree.map(lambda x: np.asarray(x[1]), states.g.variables)
    jax.tree.map(np.testing.assert_array_equal, arm0, arm1)
    assert "constraint_loss" not in ms[0] and "constraint_loss" in ms[2]
    assert not np.array_equal(ms[0]["g_loss"], ms[2]["g_loss"])


def test_settings_sweep_ema_structure_guard(cfg, small_ds):
    import dataclasses

    from pigan_thz_tpu.parallel.ensemble_megakernel import train_settings_sweep

    s = StepSettings.from_config(cfg)
    with pytest.raises(ValueError, match="ema"):
        train_settings_sweep(
            cfg, small_ds, [s, dataclasses.replace(s, ema_decay=0.99)],
            epochs=1, interpret=True,
        )


def test_seed_ensemble_envelope_guard(cfg, small_ds):
    import dataclasses

    bad = cfg.replace(
        generator=dataclasses.replace(cfg.generator, name="residual")
    )
    with pytest.raises(ValueError, match="generator"):
        train_seed_ensemble(bad, small_ds, 2, epochs=1, interpret=True)


def test_clamp_raises_past_one_program_envelope():
    """ADVICE r3: datasets whose padded spe exceeds _MAX_PROGRAM_GRID must
    refuse (scanned multi-launch shapes corrupt on v5e) instead of
    silently dispatching E=1 programs that decompose into scans."""
    from pigan_thz_tpu.ops import megakernel as MK

    with pytest.raises(ValueError, match="one-program megakernel envelope"):
        clamp_epochs_per_call(25, MK._MAX_PROGRAM_GRID + 1)


def test_ensemble_drivers_reject_zero_epochs(cfg, small_ds):
    from pigan_thz_tpu.parallel.ensemble_megakernel import train_settings_sweep
    from pigan_thz_tpu.train.steps import StepSettings

    with pytest.raises(ValueError, match="epochs must be >= 1"):
        train_seed_ensemble(cfg, small_ds, 2, epochs=0, interpret=True)
    with pytest.raises(ValueError, match="epochs must be >= 1"):
        train_settings_sweep(
            cfg, small_ds, [StepSettings.from_config(cfg)],
            epochs=0, interpret=True,
        )


@pytest.mark.slow
def test_packed_seed_ensemble_bitwise_matches_unpacked(cfg, small_ds):
    """packed=True must be BIT-IDENTICAL to the round-robin driver: the
    packed kernel consumes the exact per-member chunk keys."""
    from pigan_thz_tpu.train import init_forward_state

    g, d, f = build_trio(cfg)
    spe = small_ds.num_samples // cfg.train.batch_size
    _, _, f_tx = make_optimizers(cfg, spe)
    fvars = init_forward_state(f, f_tx, jax.random.PRNGKey(9)).f.variables

    key = jax.random.PRNGKey(21)
    a_states, a_metrics = train_seed_ensemble(
        cfg, small_ds, 3, epochs=2, key=key, epochs_per_call=1,
        forward_variables=fvars, interpret=True,
    )
    # 8 virtual devices -> three solo groups (exercises the M==1 layout);
    # a single device -> ONE packed group of 3 (exercises M>1)
    for devs in (None, jax.devices()[:1]):
        b_states, b_metrics = train_seed_ensemble(
            cfg, small_ds, 3, epochs=2, key=key, epochs_per_call=1,
            forward_variables=fvars, interpret=True, packed=True,
            devices=devs,
        )
        for k in a_metrics:
            np.testing.assert_array_equal(
                a_metrics[k], b_metrics[k], err_msg=f"{devs}: {k}"
            )
        for pa, pb in zip(
            jax.tree.leaves(a_states.g.variables),
            jax.tree.leaves(b_states.g.variables),
        ):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_packed_requires_shared_forward(cfg, small_ds):
    with pytest.raises(ValueError, match="forward_variables"):
        train_seed_ensemble(
            cfg, small_ds, 2, epochs=1, interpret=True, packed=True,
        )
