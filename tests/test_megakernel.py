"""Whole-epoch Pallas megakernel: parity with the XLA fused step.

The megakernel (ops/megakernel.py) re-implements the default fused D->G
update with hand-derived backprop, keeping params + Adam moments + BN stats
VMEM-resident.  These tests run it in interpreter mode on CPU against
`make_multi_epoch_fn` on the SAME initial state and batch schedule.

Parity criteria (why not bitwise): the two backends order float ops
differently, so gradients agree only to ~1e-6 at tensor-norm scale.  Two
generator bias vectors (the Dense biases feeding BatchNorm) have
ANALYTICALLY ZERO gradients — BN subtracts the batch mean, so the loss is
invariant to them — and Adam turns the fp-noise "gradients" into ±lr
random-walk updates on both backends; those two leaves are gauge directions
excluded from elementwise comparison (the computed function is identical).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu.data import synthetic_dataset
from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.ops.megakernel import (
    FWD_METRIC_KEYS,
    METRIC_KEYS,
    make_pallas_forward_epoch_fn,
    make_pallas_multi_epoch_fn,
    supports_forward_megakernel,
    supports_megakernel,
)
from pigan_thz_tpu.train import (
    ForwardStepSettings,
    StepSettings,
    init_forward_state,
    init_pigan_state,
    make_forward_step,
    make_multi_epoch_fn,
    make_optimizers,
    make_pigan_step,
)

# generator leaves whose true gradient is identically zero (BN gauge)
_GAUGE = ("MLPBlock_0/Dense_0/bias", "MLPBlock_1/Dense_0/bias")


def _leafname(path):
    return "/".join(str(getattr(k, "key", k)) for k in path)


def _setup(cfg, num_samples, detach=True):
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=num_samples))
    ds = synthetic_dataset(cfg.data)
    g, d, f = build_trio(cfg)
    spe = ds.num_samples // cfg.train.batch_size
    g_tx, d_tx, _ = make_optimizers(cfg, spe)
    settings = StepSettings.from_config(cfg, detach_forward=detach)
    state = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(1))
    step = make_pigan_step(g, d, f, g_tx, d_tx, settings, ds.param_lo, ds.param_hi)
    xla = make_multi_epoch_fn(step, cfg.train.batch_size, with_scale=True, unroll=1)
    pallas = make_pallas_multi_epoch_fn(cfg, settings, interpret=True)
    return ds, state, xla, pallas


def test_supports_guard(cfg):
    s = StepSettings.from_config(cfg)
    assert supports_megakernel(cfg, s) is None
    assert supports_megakernel(                       # both detach modes OK
        cfg, dataclasses.replace(s, detach_forward=False)
    ) is None
    # round-3: WGAN-GP, EMA, instance noise, augmentation, stability and
    # window are all IN-envelope (hand second-order backward / VMEM lerp /
    # exact-key precomputed streams) — the FULL StepSettings surface
    assert supports_megakernel(cfg, dataclasses.replace(s, gan_loss="wgan_gp")) is None
    assert supports_megakernel(cfg, dataclasses.replace(s, gan_loss="hinge"))
    assert supports_megakernel(cfg, dataclasses.replace(s, instance_noise=0.1)) is None
    assert supports_megakernel(cfg, dataclasses.replace(s, ema_decay=0.99)) is None
    assert supports_megakernel(cfg, dataclasses.replace(s, stability_w=0.5)) is None
    assert supports_megakernel(cfg, dataclasses.replace(s, window_w=0.5)) is None
    assert supports_megakernel(
        cfg, dataclasses.replace(s, augment_noise=0.05, augment_shift=0.02)
    ) is None
    # kl_w is identically zero on both backends -> trivially in-envelope
    assert supports_megakernel(cfg, dataclasses.replace(s, kl_w=1.0)) is None
    # round-3 envelope extension: the program-phase knobs are IN
    assert supports_megakernel(cfg, dataclasses.replace(s, constraint_w=1.0)) is None
    assert supports_megakernel(cfg, dataclasses.replace(s, d_update_every=3)) is None
    assert supports_megakernel(cfg, dataclasses.replace(s, sigmoid_squash=True)) is None
    assert supports_megakernel(
        cfg, dataclasses.replace(s, cycle_w=1.0, detach_forward=False)
    ) is None
    assert supports_megakernel(cfg, dataclasses.replace(s, adv_w=0.0)) is None
    bad = cfg.replace(generator=dataclasses.replace(cfg.generator, name="residual"))
    assert "generator" in supports_megakernel(bad, s)
    # review-hardened envelope: silent-divergence / trace-crash risks
    assert "leaky" in supports_megakernel(
        cfg.replace(discriminator=dataclasses.replace(
            cfg.discriminator, leaky_slope=0.1)), s)
    assert "grad_clip" in supports_megakernel(
        cfg.replace(train=dataclasses.replace(cfg.train, grad_clip=0.0)), s)
    assert "batch" in supports_megakernel(
        cfg.replace(train=dataclasses.replace(cfg.train, batch_size=100)), s)

    from pigan_thz_tpu.ops.megakernel import supports_forward_megakernel

    assert supports_forward_megakernel(cfg) is None
    assert "leaky" in supports_forward_megakernel(
        cfg.replace(forward_model=dataclasses.replace(
            cfg.forward_model, leaky_slope=0.3)))


def test_canonical_programs_in_envelope(cfg):
    """Every phase of the canonical training programs (progressive pipeline
    + post-hoc constraint finetune, train/programs.py) must stay inside the
    megakernel envelope — the round-3 claim that the reference's richest
    pipelines run on the fast path end to end (proven on hardware by
    examples/program_probe.py under megakernel='force').  Guards against
    programs.py and supports_megakernel drifting apart."""
    from pigan_thz_tpu.ops.megakernel import supports_forward_megakernel
    from pigan_thz_tpu.train.programs import (
        constraint_finetune_phase,
        progressive_pipeline,
    )

    phases = progressive_pipeline() + [constraint_finetune_phase()]
    assert len(phases) == 7
    for phase in phases:
        if phase.kind == "gan":
            reason = supports_megakernel(cfg, phase.gan_settings)
        else:
            reason = supports_forward_megakernel(cfg)
        assert reason is None, f"phase {phase.name!r} off-envelope: {reason}"


def test_trainer_grid_cap_fallback(cfg):
    """steps_per_epoch above the grid cap: sub-epoch launches when spe has
    a usable divisor, GATED padding when it does not (round 3) — BOTH
    kernels now cover every dataset size (the forward kernel pads the tail
    of its chained sub-epoch calls, _fwd_sub_plan)."""
    from pigan_thz_tpu.data import synthetic_dataset as synth
    from pigan_thz_tpu.train import Trainer

    big = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=128))
    ds = synth(big.data)
    t = Trainer(big, ds=ds, megakernel="force")
    t.steps_per_epoch = 499  # prime, < _MAX_GRID: single launch per epoch
    assert t._maybe_megakernel(StepSettings.from_config(big), None) is not None
    t.steps_per_epoch = 3000  # < _MAX_GRID: still single-launch territory
    assert t._maybe_megakernel(StepSettings.from_config(big), None) is not None
    # forward path: spe beyond the per-program bound engages the chained
    # sub-epoch driver (dropout off — interpret mode has no hardware PRNG)
    nod = big.replace(
        forward_model=dataclasses.replace(big.forward_model, dropout_rate=0.0)
    )
    t3 = Trainer(nod, ds=ds, megakernel="force")
    t3.steps_per_epoch = 1499  # prime > _FWD_MAX_TOTAL: gated sub-epoch plan
    fn = t3._maybe_forward_megakernel(ForwardStepSettings(), None, None)
    assert fn is not None and getattr(fn, "sub_epoch", False)


def test_forward_subepoch_auto_gate(cfg, monkeypatch):
    """On TPU, auto mode engages the forward sub-epoch driver by default
    (the split-prologue driver is hardware-proven clean — RESULTS.md);
    _FWD_SUB_AUTO_OK=False is the off-switch that keeps large datasets on
    XLA in auto mode, without affecting the single-program path."""
    from pigan_thz_tpu.data import synthetic_dataset as synth
    from pigan_thz_tpu.ops import megakernel as MK
    from pigan_thz_tpu.train import Trainer
    from pigan_thz_tpu.train import trainer as trainer_mod

    nod = cfg.replace(
        data=dataclasses.replace(cfg.data, num_samples=128),
        forward_model=dataclasses.replace(cfg.forward_model, dropout_rate=0.0),
    )
    ds = synth(nod.data)
    monkeypatch.setattr(trainer_mod.jax, "default_backend", lambda: "tpu")
    assert MK._FWD_SUB_AUTO_OK  # hardware-proven default
    t = Trainer(nod, ds=ds, megakernel="auto")
    t.steps_per_epoch = 1499                # sub-epoch territory: engages
    fn = t._maybe_forward_megakernel(ForwardStepSettings(), None, None)
    assert fn is not None and getattr(fn, "sub_epoch", False)
    monkeypatch.setattr(MK, "_FWD_SUB_AUTO_OK", False)
    t2 = Trainer(nod, ds=ds, megakernel="auto")
    t2.steps_per_epoch = 1499               # off-switch: back to XLA
    assert t2._maybe_forward_megakernel(ForwardStepSettings(), None, None) is None
    t2.steps_per_epoch = 4                  # single-program path: unaffected
    assert t2._maybe_forward_megakernel(ForwardStepSettings(), None, None) is not None


@pytest.mark.slow
def test_megakernel_matches_xla_step(cfg):
    """Two epochs on 256 samples: metrics, D params, BN stats, counts and the
    computed generator FUNCTION all match the XLA trajectory."""
    ds, state, xla, pallas = _setup(cfg, 256)
    state_b = jax.tree.map(jnp.copy, state)
    ones = jnp.ones((2,), jnp.float32)
    key = jax.random.PRNGKey(7)
    st_x, m_x = xla(state, ds, key, ones)
    st_p, m_p = pallas(state_b, ds, key, ones)

    # per-epoch metric means
    assert set(m_p) == set(METRIC_KEYS) == set(m_x)
    for k in METRIC_KEYS:
        np.testing.assert_allclose(
            np.asarray(m_p[k]), np.asarray(m_x[k]), rtol=2e-4, atol=1e-6, err_msg=k
        )

    # bookkeeping is exact
    assert int(st_p.step) == int(st_x.step)
    assert bool(jnp.all(st_p.rng == st_x.rng))
    assert int(st_p.g_opt[1][0].count) == int(st_x.g_opt[1][0].count)
    assert int(st_p.d_opt[1][1].count) == int(st_x.d_opt[1][1].count)

    # D tower and BN running stats track closely (stats absorb the gauge
    # biases' ±lr random walk — see module docstring — hence the looser atol)
    for x, y in zip(jax.tree.leaves(st_x.d.params), jax.tree.leaves(st_p.d.params)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0, atol=5e-4)
    for x, y in zip(jax.tree.leaves(st_x.g.extra), jax.tree.leaves(st_p.g.extra)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0, atol=8e-3)

    # G params: everything except the two gauge biases
    for (path, x), y in zip(
        jax.tree_util.tree_flatten_with_path(st_x.g.params)[0],
        jax.tree.leaves(st_p.g.params),
    ):
        if _leafname(path) in _GAUGE:
            continue
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=0, atol=5e-4, err_msg=_leafname(path)
        )

    # the FUNCTION both generators compute is the same (gauge-invariant)
    gen, _, _ = build_trio(cfg.replace(
        data=dataclasses.replace(cfg.data, num_samples=256)
    ))
    out_x = gen.apply({"params": st_x.g.params, **st_x.g.extra}, ds.spectra)
    out_p = gen.apply({"params": st_p.g.params, **st_p.g.extra}, ds.spectra)
    # atol catches structural errors (those give O(1) differences); the
    # residual here is the gauge drift not yet absorbed by running stats
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-2)


@pytest.mark.slow
@pytest.mark.parametrize("detach", [True, False])
def test_megakernel_gradient_parity(cfg, detach):
    """After one step, implied gradients (2x first Adam mu) agree to 1e-4 at
    tensor-norm scale for every non-gauge tensor of BOTH networks — in both
    detach modes (detach=False exercises the in-kernel backprop THROUGH the
    frozen surrogate: LN backward + Maxwell second-difference adjoint)."""
    ds, state, xla, pallas = _setup(cfg, 64, detach=detach)
    state_b = jax.tree.map(jnp.copy, state)
    ones = jnp.ones((1,), jnp.float32)
    key = jax.random.PRNGKey(3)
    st_x, _ = xla(state, ds, key, ones)
    st_p, _ = pallas(state_b, ds, key, ones)
    for net in ("g", "d"):
        mx = jax.tree_util.tree_flatten_with_path(
            getattr(st_x, f"{net}_opt")[1][0].mu
        )[0]
        mp = jax.tree.leaves(getattr(st_p, f"{net}_opt")[1][0].mu)
        for (path, x), y in zip(mx, mp):
            if net == "g" and _leafname(path) in _GAUGE:
                continue
            x = np.asarray(x, np.float64)
            y = np.asarray(y, np.float64)
            nrm = max(np.linalg.norm(x), 1e-12)
            assert np.linalg.norm(x - y) / nrm < 1e-4, f"{net}:{_leafname(path)}"


@pytest.mark.slow
def test_trainer_engages_megakernel(cfg):
    """Trainer(megakernel='force') trains through the Pallas path (interpret
    mode off-TPU) and produces the usual history; 'auto' stays on the XLA
    path off-TPU; unsupported settings raise under 'force'."""
    from pigan_thz_tpu.data import synthetic_dataset as synth
    from pigan_thz_tpu.train import Trainer

    cfg = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=128))
    ds = synth(cfg.data)
    t = Trainer(cfg, ds=ds, epochs_per_call=2, megakernel="force")
    t.init_pigan()
    t.train_pigan(epochs=2, log_every=10**9)
    assert ("gan-mega", StepSettings.from_config(cfg), None) in t._epoch_fns
    assert np.isfinite(t.train_history["pigan/g_loss"][-1])
    assert len(t.train_history["pigan/d_loss"]) == 2

    t2 = Trainer(cfg, ds=ds, epochs_per_call=2, megakernel="auto")
    t2.init_pigan()
    t2.train_pigan(epochs=1, log_every=10**9)
    assert not any(k[0] == "gan-mega" for k in t2._epoch_fns)  # CPU -> XLA

    # wgan_gp entered the envelope in round 3 (hand-derived second-order
    # backward): force now ENGAGES instead of raising
    t3 = Trainer(cfg, ds=ds, megakernel="force")
    t3.init_pigan()
    t3.train_pigan(
        epochs=1, log_every=10**9,
        settings=StepSettings.from_config(cfg, gan_loss="wgan_gp"),
    )
    assert any(k[0] == "gan-mega" for k in t3._epoch_fns)
    assert np.isfinite(t3.train_history["pigan/g_loss"][-1])


@pytest.mark.slow
@pytest.mark.parametrize("fset", [
    ForwardStepSettings(),
    ForwardStepSettings(spectrum_w=5.0, metrics_w=2.0, smoothness_w=0.5, l1_w=0.5),
])
def test_forward_megakernel_parity(cfg, fset):
    """Forward-pretrain megakernel vs the XLA step, dropout_rate=0 for exact
    comparability (dropout masks come from the TPU PRNG in-kernel, from
    jax.random in XLA — same distribution, different bits).  Covers the
    default MSE+MSE loss and the constraint/emergency weighting with
    smoothness + L1 terms."""
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, num_samples=128),
        forward_model=dataclasses.replace(cfg.forward_model, dropout_rate=0.0),
    )
    ds = synthetic_dataset(cfg.data)
    _, _, f = build_trio(cfg)
    spe = ds.num_samples // cfg.train.batch_size
    _, _, f_tx = make_optimizers(cfg, spe)
    assert supports_forward_megakernel(cfg) is None
    st = init_forward_state(f, f_tx, jax.random.PRNGKey(2))
    st_b = jax.tree.map(jnp.copy, st)
    xla = make_multi_epoch_fn(make_forward_step(f, f_tx, fset),
                              cfg.train.batch_size, with_scale=False, unroll=1)
    pallas = make_pallas_forward_epoch_fn(cfg, fset, interpret=True)
    ones = jnp.ones((2,), jnp.float32)
    key = jax.random.PRNGKey(11)
    st_x, m_x = xla(st, ds, key, ones)
    st_p, m_p = pallas(st_b, ds, key, ones)
    assert set(m_p) == set(FWD_METRIC_KEYS)
    for k in FWD_METRIC_KEYS:
        np.testing.assert_allclose(
            np.asarray(m_p[k]), np.asarray(m_x[k]), rtol=5e-4, err_msg=k
        )
    assert int(st_p.step) == int(st_x.step)
    assert bool(jnp.all(st_p.rng == st_x.rng))
    assert int(st_p.opt[1][0].count) == int(st_x.opt[1][0].count) == 4
    for (path, x), y in zip(
        jax.tree_util.tree_flatten_with_path(st_x.f.params)[0],
        jax.tree.leaves(st_p.f.params),
    ):
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=0, atol=5e-4,
            err_msg=_leafname(path),
        )


@pytest.mark.slow
def test_forward_subepoch_driver_parity(cfg, monkeypatch):
    """Sub-epoch forward driver (round 3, spe above the per-PROGRAM grid
    bound): each epoch runs as spe/L chained jitted calls of L steps;
    partial metric rows sum to the exact per-epoch means and the state
    matches the one-program megakernel AND the XLA trajectory.  The bound
    is monkeypatched small so interpret mode stays cheap (spe=8 -> two
    calls of 4 steps per epoch)."""
    from pigan_thz_tpu.ops import megakernel as MK
    from pigan_thz_tpu.ops.megakernel import make_pallas_forward_subepoch_fn
    from pigan_thz_tpu.train import ForwardStepSettings

    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, num_samples=512),
        forward_model=dataclasses.replace(cfg.forward_model, dropout_rate=0.0),
    )
    fset = ForwardStepSettings()
    ds = synthetic_dataset(cfg.data)
    _, _, f = build_trio(cfg)
    spe = ds.num_samples // cfg.train.batch_size   # 8
    _, _, f_tx = make_optimizers(cfg, spe)
    st = init_forward_state(f, f_tx, jax.random.PRNGKey(2))
    st_b = jax.tree.map(jnp.copy, st)
    xla = make_multi_epoch_fn(make_forward_step(f, f_tx, fset),
                              cfg.train.batch_size, with_scale=False, unroll=1)
    monkeypatch.setattr(MK, "_FWD_MAX_TOTAL", 4)   # spe=8 -> L=4, 2 calls
    sub = make_pallas_forward_subepoch_fn(cfg, fset, interpret=True)
    assert getattr(sub, "sub_epoch", False)
    ones = jnp.ones((2,), jnp.float32)
    key = jax.random.PRNGKey(11)
    st_x, m_x = xla(st, ds, key, ones)
    st_p, m_p = sub(st_b, ds, key, ones)
    for k in FWD_METRIC_KEYS:
        np.testing.assert_allclose(
            np.asarray(m_p[k]), np.asarray(m_x[k]), rtol=5e-4, err_msg=k
        )
    assert int(st_p.step) == int(st_x.step) == 16
    assert bool(jnp.all(st_p.rng == st_x.rng))
    assert int(st_p.opt[1][0].count) == int(st_x.opt[1][0].count) == 16
    for (path, x), y in zip(
        jax.tree_util.tree_flatten_with_path(st_x.f.params)[0],
        jax.tree.leaves(st_p.f.params),
    ):
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=0, atol=5e-4,
            err_msg=_leafname(path),
        )


@pytest.mark.slow
def test_forward_subepoch_sync_knob_and_hooks(cfg, monkeypatch):
    """_FWD_SYNC_EVERY bounds the in-flight sub-call depth (hardware
    forensics / mitigation knob): syncing after every dispatch must not
    change the trajectory, and the driver exposes its per-call internals
    (_mk_sub_call/_calls) for the bisect probe."""
    from pigan_thz_tpu.ops import megakernel as MK
    from pigan_thz_tpu.ops.megakernel import make_pallas_forward_subepoch_fn
    from pigan_thz_tpu.train import ForwardStepSettings

    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, num_samples=512),
        forward_model=dataclasses.replace(cfg.forward_model, dropout_rate=0.0),
    )
    fset = ForwardStepSettings()
    ds = synthetic_dataset(cfg.data)
    _, _, f = build_trio(cfg)
    spe = ds.num_samples // cfg.train.batch_size   # 8
    _, _, f_tx = make_optimizers(cfg, spe)
    st = init_forward_state(f, f_tx, jax.random.PRNGKey(2))
    st_b = jax.tree.map(jnp.copy, st)
    monkeypatch.setattr(MK, "_FWD_MAX_TOTAL", 4)   # spe=8 -> L=4, 2 calls
    sub = make_pallas_forward_subepoch_fn(cfg, fset, interpret=True)
    assert callable(sub._mk_sub_call) and isinstance(sub._calls, dict)
    monkeypatch.setattr(MK, "_FWD_SYNC_EVERY", 1)
    sub_sync = make_pallas_forward_subepoch_fn(cfg, fset, interpret=True)
    ones = jnp.ones((1,), jnp.float32)
    key = jax.random.PRNGKey(11)
    st_a, m_a = sub(st, ds, key, ones)
    st_s, m_s = sub_sync(st_b, ds, key, ones)
    for k in FWD_METRIC_KEYS:
        np.testing.assert_allclose(
            np.asarray(m_s[k]), np.asarray(m_a[k]), rtol=0, err_msg=k
        )
    for x, y in zip(jax.tree.leaves(st_a.f.params),
                    jax.tree.leaves(st_s.f.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_forward_subepoch_gated_padding_parity(cfg, monkeypatch):
    """Divisor-less spe on the forward sub-epoch driver (round 3): the
    epoch pads to spe_pad chained calls steps and the TAIL call's padded
    steps are gated no-ops — state trajectory, rng chain, optimizer count
    and per-epoch metric means all match XLA exactly.  Bound monkeypatched
    small: spe=7 (prime) pads to 8, two calls of 4, tail live=3."""
    from pigan_thz_tpu.ops import megakernel as MK
    from pigan_thz_tpu.ops.megakernel import make_pallas_forward_subepoch_fn
    from pigan_thz_tpu.train import ForwardStepSettings

    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, num_samples=448),
        forward_model=dataclasses.replace(cfg.forward_model, dropout_rate=0.0),
    )
    fset = ForwardStepSettings()
    ds = synthetic_dataset(cfg.data)
    _, _, f = build_trio(cfg)
    spe = ds.num_samples // cfg.train.batch_size   # 7
    _, _, f_tx = make_optimizers(cfg, spe)
    st = init_forward_state(f, f_tx, jax.random.PRNGKey(2))
    st_b = jax.tree.map(jnp.copy, st)
    xla = make_multi_epoch_fn(make_forward_step(f, f_tx, fset),
                              cfg.train.batch_size, with_scale=False, unroll=1)
    monkeypatch.setattr(MK, "_FWD_MAX_TOTAL", 4)
    monkeypatch.setattr(MK, "_MIN_SUB_LAUNCH", 2)
    assert MK._fwd_sub_plan(7) == (4, 8)
    sub = make_pallas_forward_subepoch_fn(cfg, fset, interpret=True)
    ones = jnp.ones((2,), jnp.float32)
    key = jax.random.PRNGKey(13)
    st_x, m_x = xla(st, ds, key, ones)
    st_p, m_p = sub(st_b, ds, key, ones)
    for k in FWD_METRIC_KEYS:
        np.testing.assert_allclose(
            np.asarray(m_p[k]), np.asarray(m_x[k]), rtol=5e-4, err_msg=k
        )
    # padded tail steps advance NOTHING: step/rng/count all count 14 real
    assert int(st_p.step) == int(st_x.step) == 14
    assert bool(jnp.all(st_p.rng == st_x.rng))
    assert int(st_p.opt[1][0].count) == int(st_x.opt[1][0].count) == 14
    for (path, x), y in zip(
        jax.tree_util.tree_flatten_with_path(st_x.f.params)[0],
        jax.tree.leaves(st_p.f.params),
    ):
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=0, atol=5e-4,
            err_msg=_leafname(path),
        )


@pytest.mark.slow
def test_forward_megakernel_dropout_runs(cfg):
    """With dropout on, the kernel draws masks from the hardware PRNG —
    check the training trajectory is healthy (loss decreases) even though
    the bitstream differs from jax.random."""
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=128))
    assert cfg.forward_model.dropout_rate > 0.0
    ds = synthetic_dataset(cfg.data)
    _, _, f = build_trio(cfg)
    _, _, f_tx = make_optimizers(cfg, 2)
    st = init_forward_state(f, f_tx, jax.random.PRNGKey(2))
    try:
        pallas = make_pallas_forward_epoch_fn(cfg, ForwardStepSettings(),
                                              interpret=True)
        st, m = pallas(st, ds, jax.random.PRNGKey(11),
                       jnp.ones((8,), jnp.float32))
    except Exception as e:  # pragma: no cover - interpreter PRNG support
        pytest.skip(f"interpret-mode TPU PRNG unavailable: {e}")
    losses = np.asarray(m["loss"])
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_forward_megakernel_program_grid_bound(cfg, monkeypatch):
    """The forward kernel runs ONE launch per jitted program with E*spe <=
    _FWD_MAX_TOTAL (hardware-proven single-launch scale — megakernel.py
    bound notes).  The factory must refuse over-bound programs outright
    (interpret mode exempt: no Mosaic), and the Trainer must clamp its
    per-call chunk so the bound is never hit (checked here with a
    test-shrunk bound of 105, the pre-root-cause value)."""
    from pigan_thz_tpu.ops import megakernel as MK

    big = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=960))
    ds = synthetic_dataset(big.data)  # spe = 15, the reference shape
    _, _, f = build_trio(big)
    _, _, f_tx = make_optimizers(big, 15)
    st = init_forward_state(f, f_tx, jax.random.PRNGKey(0))
    pallas = make_pallas_forward_epoch_fn(big, ForwardStepSettings())
    with pytest.raises(ValueError, match="per-program grid bound"):
        pallas(st, ds, jax.random.PRNGKey(1),
               jnp.ones((97,), jnp.float32))  # 97*15 = 1455 > the bound

    monkeypatch.setattr(MK, "_FWD_MAX_TOTAL", 105)
    with pytest.raises(ValueError, match="per-program grid bound"):
        pallas(st, ds, jax.random.PRNGKey(1),
               jnp.ones((8,), jnp.float32))  # 8*15 = 120 > shrunk bound

    # Trainer clamp: with a (fake) engaged megakernel at spe=15 and
    # epochs_per_call=25, every forward chunk must be <= 105//15 = 7 epochs
    from pigan_thz_tpu.train import Trainer

    # shadow_parity off: fake_mega below returns zeroed (finite-but-wrong)
    # metrics, which the shadow net would rightly trip on
    # (test_shadow_parity.py covers that); this test only checks chunking
    t = Trainer(
        big, ds=ds, epochs_per_call=25, megakernel="off", shadow_parity="off"
    )
    chunks = []

    def fake_mega(state, ds_, key, scales):
        chunks.append(int(scales.shape[0]))
        E = scales.shape[0]
        metrics = {k: jnp.zeros((E,), jnp.float32) for k in FWD_METRIC_KEYS}
        return state, metrics

    t._maybe_forward_megakernel = lambda settings, lr, epochs, schedule="cosine": fake_mega
    t.pretrain_forward(epochs=16, log_every=10**9)
    assert chunks == [7, 7, 2]
    assert max(chunks) * 15 <= MK._FWD_MAX_TOTAL


@pytest.mark.slow
def test_megakernel_bf16_mode(cfg):
    """compute_dtype=bfloat16: matmul operands in bf16, everything else f32.
    Not a bitwise-parity mode — assert the trajectory is healthy and close
    to the f32 one at trajectory scale."""
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, num_samples=128),
        train=dataclasses.replace(cfg.train, compute_dtype="bfloat16"),
    )
    ds = synthetic_dataset(cfg.data)
    g, d, f = build_trio(cfg.replace(
        train=dataclasses.replace(cfg.train, compute_dtype="float32")
    ))
    spe = ds.num_samples // cfg.train.batch_size
    g_tx, d_tx, _ = make_optimizers(cfg, spe)
    settings = StepSettings.from_config(cfg)
    assert supports_megakernel(cfg, settings) is None
    state = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(1))
    pme = make_pallas_multi_epoch_fn(cfg, settings, interpret=True)
    ones = jnp.ones((2,), jnp.float32)
    st, m = pme(state, ds, jax.random.PRNGKey(7), ones)
    for k in METRIC_KEYS:
        assert np.all(np.isfinite(np.asarray(m[k]))), k
    # bf16 matmuls still produce a healthy GAN step (d_loss near 2*BCE(0.9))
    assert 0.5 < float(m["d_loss"][-1]) < 5.0
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(st.g.params))


@pytest.mark.slow
def test_trainer_falls_back_on_nonfinite_megakernel(cfg, monkeypatch, capsys):
    """Reliability net: if a megakernel chunk returns non-finite metrics
    (observed Mosaic operand-corruption mode, ops/megakernel.py _MAX_GRID
    note), the Trainer restores the pre-chunk state, reruns the chunk on
    the XLA path, and keeps training — history stays finite throughout.
    The trip is recorded (fallback_events with the chunk's start epoch) and
    reported on stderr even for loggerless Trainers."""
    from pigan_thz_tpu.data import synthetic_dataset as synth
    from pigan_thz_tpu.train import Trainer

    cfg = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=128))
    ds = synth(cfg.data)
    t = Trainer(cfg, ds=ds, epochs_per_call=2)

    calls = {"n": 0}

    def poisoned(state, ds_, key, scales):
        calls["n"] += 1
        bad = jax.tree.map(lambda x: jnp.full_like(x, jnp.nan), state)
        metrics = {k: jnp.full((scales.shape[0],), jnp.nan) for k in METRIC_KEYS}
        return bad, metrics

    monkeypatch.setattr(Trainer, "_maybe_megakernel",
                        lambda self, settings, override_key: poisoned)
    t.init_pigan()
    t.train_pigan(epochs=2, log_every=10**9)
    assert calls["n"] == 1  # poisoned chunk ran once, then XLA took over
    assert t.fallback_trips == 1
    assert t.fallback_events == ["pigan@epoch0"]
    assert "epoch 0" in capsys.readouterr().err  # loggerless -> stderr
    assert all(np.isfinite(v).all() for v in
               (np.asarray(x) for x in t.train_history.values()))
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(t.pigan_state.g.params))


@pytest.mark.slow
def test_megakernel_chunked_launch_parity(cfg, monkeypatch):
    """The grid cap (_MAX_GRID) splits a chunk into scan sub-launches + a
    tail launch; force tiny sub-chunks and check the trajectory matches the
    XLA path exactly as in the single-launch case (state flows through HBM
    between launches without loss)."""
    from pigan_thz_tpu.ops import megakernel as MK

    monkeypatch.setattr(MK, "_MAX_GRID", 7)  # spe=4 -> inner=1 epoch/launch
    ds, state, xla, pallas = _setup(cfg, 256)
    state_b = jax.tree.map(jnp.copy, state)
    scales = jnp.ones((3,), jnp.float32)  # 3 epochs: 3 launches, no tail=0
    key = jax.random.PRNGKey(21)
    st_x, m_x = xla(state, ds, key, scales)
    st_p, m_p = pallas(state_b, ds, key, scales)
    for k in METRIC_KEYS:
        np.testing.assert_allclose(
            np.asarray(m_p[k]), np.asarray(m_x[k]), rtol=5e-4, atol=1e-6, err_msg=k
        )
    assert int(st_p.g_opt[1][0].count) == int(st_x.g_opt[1][0].count) == 12


@pytest.mark.slow
def test_megakernel_continues_from_xla_state(cfg):
    """Backends interleave: XLA epoch -> megakernel epoch == resumable state
    (counts, schedules and bias corrections line up mid-run)."""
    ds, state, xla, pallas = _setup(cfg, 128)
    ones = jnp.ones((1,), jnp.float32)
    st1, _ = xla(state, ds, jax.random.PRNGKey(0), ones)
    st1_copy = jax.tree.map(jnp.copy, st1)
    st2_x, m_x = xla(st1, ds, jax.random.PRNGKey(1), ones)
    st2_p, m_p = pallas(st1_copy, ds, jax.random.PRNGKey(1), ones)
    for k in METRIC_KEYS:
        np.testing.assert_allclose(
            np.asarray(m_p[k]), np.asarray(m_x[k]), rtol=5e-4, atol=1e-6, err_msg=k
        )
    assert int(st2_p.g_opt[1][0].count) == int(st2_x.g_opt[1][0].count) == 4


@pytest.mark.slow
def test_megakernel_debug_instrumentation(cfg, monkeypatch):
    """The forensic dev flags stay usable: _DEBUG_LANES compiles and fills
    checksum lanes with the documented quantities; _DEBUG_PER_STEP emits one
    metrics row per STEP (undivided) instead of per-epoch means."""
    from pigan_thz_tpu.ops import megakernel as MK

    monkeypatch.setattr(MK, "_DEBUG_LANES", True)
    ds, state, _, pallas = _setup(cfg, 128)
    state_b = jax.tree.map(jnp.copy, state)
    ones = jnp.ones((1,), jnp.float32)
    st, m = pallas(state, ds, jax.random.PRNGKey(5), ones)
    spe = 128 // 64
    # lane 10 = sum|spectra| per step (epoch-mean): matches the data exactly
    spec_sum = float(jnp.sum(jnp.abs(ds.spectra)))  # every sample used once
    np.testing.assert_allclose(float(m["dbg_0"][0]) * spe, spec_sum, rtol=1e-5)
    # lane 23 = lr_g: first-step cosine LR is ~cfg.train.lr_g
    assert abs(float(m["dbg_13"][0]) - 2e-4) / 2e-4 < 0.05
    # lane 24 = inv2_g bias correction: 1/(1-b2^t), large at t=1
    assert float(m["dbg_14"][0]) > 100.0
    for k, v in m.items():
        assert np.all(np.isfinite(np.asarray(v))), k

    monkeypatch.setattr(MK, "_DEBUG_LANES", False)
    monkeypatch.setattr(MK, "_DEBUG_PER_STEP", True)
    small = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=128))
    pallas2 = MK.make_pallas_multi_epoch_fn(
        small, StepSettings.from_config(cfg), interpret=True
    )
    st2, m2 = pallas2(state_b, ds, jax.random.PRNGKey(5), ones)
    assert m2["d_loss"].shape[0] == spe  # one row per step
    assert np.all(np.isfinite(np.asarray(m2["d_loss"])))


@pytest.mark.slow
def test_forward_debug_instrumentation(cfg, monkeypatch):
    """_DEBUG_LANES on the FORWARD kernel (round-3 forensics for the
    hardware NaN bisect): checksum lanes compile on both drivers and carry
    the documented quantities — dbg_1 = per-step mean of sum|spectra|,
    dbg_9/10/11 = lr/inv1/inv2 schedule row."""
    from pigan_thz_tpu.ops import megakernel as MK
    from pigan_thz_tpu.train import ForwardStepSettings

    c = cfg.replace(
        data=dataclasses.replace(cfg.data, num_samples=128),
        forward_model=dataclasses.replace(cfg.forward_model, dropout_rate=0.0),
    )
    ds = synthetic_dataset(c.data)
    _, _, f = build_trio(c)
    spe = 128 // c.train.batch_size   # 2
    _, _, f_tx = make_optimizers(c, spe)
    st = init_forward_state(f, f_tx, jax.random.PRNGKey(2))
    st_b = jax.tree.map(jnp.copy, st)
    monkeypatch.setattr(MK, "_DEBUG_LANES", True)
    fn = MK.make_pallas_forward_epoch_fn(c, ForwardStepSettings(), interpret=True)
    ones = jnp.ones((1,), jnp.float32)
    st1, m = fn(st, ds, jax.random.PRNGKey(5), ones)
    lane = {k: f"dbg_{j}" for j, k in enumerate(MK.FWD_DEBUG_KEYS)}
    spec_sum = float(jnp.sum(jnp.abs(ds.spectra)))  # every sample used once
    np.testing.assert_allclose(
        float(m[lane["spectra"]][0]) * spe, spec_sum, rtol=1e-5
    )
    lr0 = c.train.fwd_pretrain_lr
    assert abs(float(m[lane["lr"]][0]) * spe - lr0 * 2) / lr0 < 0.05  # 2 steps
    assert float(m[lane["inv1"]][0]) > 1.0   # bias correction, large at t=1
    for k, v in m.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    # sub-epoch driver carries the same lanes
    monkeypatch.setattr(MK, "_FWD_MAX_TOTAL", 1)
    sub = MK.make_pallas_forward_subepoch_fn(c, ForwardStepSettings(),
                                             interpret=True)
    st2, m2 = sub(st_b, ds, jax.random.PRNGKey(5), ones)
    np.testing.assert_allclose(
        float(m2[lane["spectra"]][0]) * spe, spec_sum, rtol=1e-5
    )
    for k, v in m2.items():
        assert np.all(np.isfinite(np.asarray(v))), k


@pytest.mark.slow
def test_megakernel_nondefault_range_window(cfg):
    """range_lo/range_hi other than [0,1]: the kernel's range/violation
    reductions are masked to the 4 real parameter lanes, so a window not
    containing 0 (where padded tanh lanes sit) stays exact vs XLA."""
    c = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=64))
    ds = synthetic_dataset(c.data)
    g, d, f = build_trio(c)
    g_tx, d_tx, _ = make_optimizers(c, 1)
    settings = StepSettings.from_config(c, range_lo=0.1, range_hi=0.9)
    assert supports_megakernel(c, settings) is None
    state = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(1))
    state_b = jax.tree.map(jnp.copy, state)
    step = make_pigan_step(g, d, f, g_tx, d_tx, settings, ds.param_lo, ds.param_hi)
    xla = make_multi_epoch_fn(step, c.train.batch_size, with_scale=True, unroll=1)
    pallas = make_pallas_multi_epoch_fn(c, settings, interpret=True)
    ones = jnp.ones((1,), jnp.float32)
    st_x, m_x = xla(state, ds, jax.random.PRNGKey(3), ones)
    st_p, m_p = pallas(state_b, ds, jax.random.PRNGKey(3), ones)
    for k in ("param_range_loss", "violation_rate", "g_loss"):
        np.testing.assert_allclose(
            np.asarray(m_p[k]), np.asarray(m_x[k]), rtol=5e-4, atol=1e-6, err_msg=k
        )


def _setup_sub(cfg, num_samples, settings=None, monkeypatch=None):
    """Like _setup but builds the chained GAN SUB-EPOCH driver
    (make_pallas_subepoch_fn) with the grid caps monkeypatched small so
    interpret mode stays cheap — plus the ONE-PROGRAM pallas factory at
    the SAME caps as the bit-exact reference (at these caps _launch_plan
    decomposes it into the same launch/row sizes, so the two must agree
    BITWISE; the one-program kernel's own XLA parity is covered by
    test_megakernel_matches_xla_step and friends)."""
    from pigan_thz_tpu.ops import megakernel as MK

    monkeypatch.setattr(MK, "_MAX_GRID", 4)
    monkeypatch.setattr(MK, "_SUB_LAUNCH_FLOOR", 2)
    cfg = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=num_samples))
    ds = synthetic_dataset(cfg.data)
    g, d, f = build_trio(cfg)
    spe = ds.num_samples // cfg.train.batch_size
    g_tx, d_tx, _ = make_optimizers(cfg, spe)
    if settings is None:
        settings = StepSettings.from_config(cfg)
    state = init_pigan_state(
        g, d, f, g_tx, d_tx, jax.random.PRNGKey(1),
        ema=float(settings.ema_decay) > 0.0,
    )
    step = make_pigan_step(g, d, f, g_tx, d_tx, settings, ds.param_lo, ds.param_hi)
    xla = make_multi_epoch_fn(step, cfg.train.batch_size, with_scale=True, unroll=1)
    one = make_pallas_multi_epoch_fn(cfg, settings, interpret=True)
    from pigan_thz_tpu.ops.megakernel import make_pallas_subepoch_fn

    sub = make_pallas_subepoch_fn(cfg, settings, interpret=True)
    return ds, state, xla, one, sub


def _assert_bitwise_state(st_a, st_b):
    """Every leaf of two PiGanStates identical to the bit (metrics aside,
    the chained driver must reproduce the one-program kernel EXACTLY —
    same kernel function, same launch sizes, exact pad/crop round trips
    between calls)."""
    for (path, x), y in zip(
        jax.tree_util.tree_flatten_with_path(st_a)[0], jax.tree.leaves(st_b)
    ):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y), err_msg=_leafname(path)
        )


def _assert_gan_state_close(st_x, st_p):
    """vs-XLA trailer (established megakernel tolerances): bookkeeping
    exact, D params / BN stats / non-gauge G params elementwise-close."""
    assert int(st_p.step) == int(st_x.step)
    assert bool(jnp.all(st_p.rng == st_x.rng))
    assert int(st_p.g_opt[1][0].count) == int(st_x.g_opt[1][0].count)
    assert int(st_p.d_opt[1][0].count) == int(st_x.d_opt[1][0].count)
    # atols here are a touch looser than test_megakernel_matches_xla_step's
    # (those were tuned on its specific trajectory); they still catch
    # structural errors, which give O(1) differences — the bit-exact
    # sub-vs-one-program check is the load-bearing assertion
    for x, y in zip(jax.tree.leaves(st_x.d.params), jax.tree.leaves(st_p.d.params)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0, atol=2e-3)
    # BN running stats absorb the gauge biases' ±lr random walk (module
    # docstring); the drift depends on the trajectory
    for x, y in zip(jax.tree.leaves(st_x.g.extra), jax.tree.leaves(st_p.g.extra)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0, atol=3e-2)
    for (path, x), y in zip(
        jax.tree_util.tree_flatten_with_path(st_x.g.params)[0],
        jax.tree.leaves(st_p.g.params),
    ):
        if _leafname(path) in _GAUGE:
            continue
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=0, atol=2e-3, err_msg=_leafname(path)
        )


def test_gan_subepoch_driver_parity(cfg, monkeypatch):
    """Chained GAN sub-epoch driver (round 3c, datasets past the
    one-program grid envelope): each epoch runs as spe/L chained
    single-launch jitted calls.  BIT-identical to the one-program pallas
    kernel at the same launch sizes (metrics and every state leaf), and
    within the established megakernel tolerances of the XLA trajectory.
    Caps monkeypatched small: spe=8 -> two calls of 4 steps per epoch."""
    from pigan_thz_tpu.ops import megakernel as MK

    ds, state, xla, one, sub = _setup_sub(cfg, 512, monkeypatch=monkeypatch)
    assert MK._gan_sub_plan(8) == (4, 8)
    assert getattr(sub, "sub_epoch", False)
    st0_b, st0_c = (jax.tree.map(jnp.copy, state) for _ in range(2))
    ones = jnp.ones((2,), jnp.float32)
    key = jax.random.PRNGKey(7)
    st_x, m_x = xla(state, ds, key, ones)
    st_o, m_o = one(st0_b, ds, key, ones)
    st_p, m_p = sub(st0_c, ds, key, ones)
    assert set(m_p) == set(METRIC_KEYS) == set(m_x)
    for k in METRIC_KEYS:
        np.testing.assert_array_equal(
            np.asarray(m_p[k]), np.asarray(m_o[k]), err_msg=k
        )
    _assert_bitwise_state(st_o, st_p)
    assert int(st_p.step) == 16
    _assert_gan_state_close(st_x, st_p)


@pytest.mark.slow
def test_gan_subepoch_gated_padding_parity(cfg, monkeypatch):
    """Divisor-less spe on the GAN sub-epoch driver: the epoch pads to
    spe_pad chained call steps and the TAIL call's padded steps are gated
    no-ops — bit-identical to the one-program gated plan, and step/rng/
    counts advance by REAL steps only.  spe=7 (prime) pads to 8: two
    calls of 4, tail live=3."""
    from pigan_thz_tpu.ops import megakernel as MK

    ds, state, xla, one, sub = _setup_sub(cfg, 448, monkeypatch=monkeypatch)
    assert MK._gan_sub_plan(7) == (4, 8)
    st0_b, st0_c = (jax.tree.map(jnp.copy, state) for _ in range(2))
    ones = jnp.ones((2,), jnp.float32)
    key = jax.random.PRNGKey(13)
    st_x, m_x = xla(state, ds, key, ones)
    st_o, m_o = one(st0_b, ds, key, ones)
    st_p, m_p = sub(st0_c, ds, key, ones)
    for k in METRIC_KEYS:
        np.testing.assert_array_equal(
            np.asarray(m_p[k]), np.asarray(m_o[k]), err_msg=k
        )
    _assert_bitwise_state(st_o, st_p)
    # padded tail steps advance NOTHING: step/rng/counts all count 14 real
    assert int(st_p.step) == int(st_x.step) == 14
    _assert_gan_state_close(st_x, st_p)


@pytest.mark.slow
def test_gan_subepoch_program_knobs_parity(cfg, monkeypatch):
    """The program-phase knobs the sub driver supports in-kernel
    (d_update_every > 1 with cross-call D-count continuity, constraint
    annealing via the scale lane, EMA track) stay bit-identical to the
    one-program kernel through a padded chained plan (spe=7 -> calls of
    4, tail live=3) with a non-uniform annealing schedule, and track XLA
    at the established tolerances."""
    settings = dataclasses.replace(
        StepSettings.from_config(cfg),
        d_update_every=2, constraint_w=0.5, ema_decay=0.99,
    )
    ds, state, xla, one, sub = _setup_sub(
        cfg, 448, settings=settings, monkeypatch=monkeypatch
    )
    st0_b, st0_c = (jax.tree.map(jnp.copy, state) for _ in range(2))
    scales = jnp.asarray([1.0, 0.25], jnp.float32)
    key = jax.random.PRNGKey(17)
    st_x, m_x = xla(state, ds, key, scales)
    st_o, m_o = one(st0_b, ds, key, scales)
    st_p, m_p = sub(st0_c, ds, key, scales)
    assert set(m_p) == set(METRIC_KEYS) | {"constraint_loss"}
    for k in m_p:
        np.testing.assert_array_equal(
            np.asarray(m_p[k]), np.asarray(m_o[k]), err_msg=k
        )
    _assert_bitwise_state(st_o, st_p)
    # D updated on every SECOND real step only: 14 real steps -> 7 updates
    assert int(st_p.d_opt[1][0].count) == int(st_x.d_opt[1][0].count) == 7
    _assert_gan_state_close(st_x, st_p)
    for x, y in zip(jax.tree.leaves(st_x.g_ema), jax.tree.leaves(st_p.g_ema)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0, atol=5e-4)


def test_gan_subepoch_envelope(cfg):
    """supports_gan_subepoch: the stochastic-stream knobs are out of the
    chained driver's envelope (their rng chain spans the whole epoch) and
    the factory refuses them."""
    from pigan_thz_tpu.ops.megakernel import (
        make_pallas_subepoch_fn,
        supports_gan_subepoch,
    )

    base = StepSettings.from_config(cfg)
    assert supports_gan_subepoch(base) is None
    assert supports_gan_subepoch(
        dataclasses.replace(base, d_update_every=2, constraint_w=1.0,
                            cycle_w=0.5, sigmoid_squash=True, ema_decay=0.9)
    ) is None
    for bad in (
        dict(instance_noise=0.05),
        dict(stability_w=0.1),
        dict(augment_noise=0.05),
        dict(gan_loss="wgan_gp"),
    ):
        s = dataclasses.replace(base, **bad)
        assert supports_gan_subepoch(s) is not None
        with pytest.raises(ValueError, match="rng chain"):
            make_pallas_subepoch_fn(cfg, s, interpret=True)


def test_launch_plan_uniform(monkeypatch):
    """Launch decomposition is UNIFORM: n identical launches, no tail.
    Covers the round-2 corrupting shape (epochs_per_call=25 at spe=15,
    formerly scan 3x120-grid + tail 1x15-grid) and the round-3 sub-epoch
    decomposition for spe above the grid cap."""
    from pigan_thz_tpu.ops import megakernel as MK

    # (launch_steps, n_launches, row_steps, spe_pad)
    # New default caps (post-root-cause): every Trainer shape is a SINGLE
    # launch — the hardware-proven-unbounded program shape
    assert MK._launch_plan(25, 15) == (375, 1, 15, 15)    # default chunk
    assert MK._launch_plan(100, 15) == (1500, 1, 15, 15)  # bench chunk
    assert MK._launch_plan(12, 312) == (3744, 1, 312, 312)  # 20k corpus
    assert MK._launch_plan(11, 313) == (3443, 1, 313, 313)  # prime spe: no pad
    assert MK._launch_plan(6, 1) == (6, 1, 1, 1)
    # decomposition logic coverage under the pre-root-cause caps (the
    # plan algorithm is cap-agnostic; production only reaches these
    # branches for spe > _MAX_GRID)
    monkeypatch.setattr(MK, "_MAX_GRID", 120)
    monkeypatch.setattr(MK, "_MAX_PROGRAM_GRID", 1500)
    assert MK._launch_plan(25, 15) == (75, 5, 15, 15)
    assert MK._launch_plan(100, 15) == (75, 20, 15, 15)
    assert MK._launch_plan(50, 15) == (75, 10, 15, 15)
    assert MK._launch_plan(23, 15) == (15, 23, 15, 15)   # prime E
    assert MK._launch_plan(8, 15) == (120, 1, 15, 15)    # single: <= 120
    assert MK._launch_plan(24, 15) == (60, 6, 15, 15)    # multi: <= 75
    assert MK._launch_plan(16, 15) == (60, 4, 15, 15)
    assert MK._launch_plan(1, 120) == (120, 1, 120, 120)
    # sub-epoch shapes (spe > multi-launch cap)
    assert MK._launch_plan(4, 312) == (52, 24, 52, 312)  # 20k corpus @ B=64
    assert MK._launch_plan(1, 150) == (75, 2, 75, 150)
    assert MK._launch_plan(2, 80) == (40, 4, 40, 80)
    # divisor-less spe: GATED plan — each epoch pads to the nearest count
    # with a sub-launch divisor, tail steps stream live=0 (round 3)
    assert MK._launch_plan(25, 97) == (49, 50, 49, 98)   # prime: pad 1
    assert MK._launch_plan(2, 158) == (53, 6, 53, 159)   # 2*79: pad 1
    for E, spe in (
        (25, 15), (97, 13), (40, 7), (3, 120), (24, 15), (4, 312),
        (1, 150), (2, 80), (25, 97), (2, 158), (3, 1003),
    ):
        ls, n, rs, spe_pad = MK._launch_plan(E, spe)
        assert ls * n == E * spe_pad                 # exact cover
        assert spe_pad >= spe
        assert spe_pad - spe < ls                    # < one launch of waste
        assert ls % rs == 0 and spe_pad % rs == 0    # rows align
        if n == 1:
            assert ls <= MK._MAX_GRID or E == 1
        else:
            assert ls <= MK._MAX_GRID_MULTI
        if spe_pad != spe:
            assert ls >= MK._MIN_SUB_LAUNCH          # never degenerate


def test_mega_gan_chunk_cap():
    """The Trainer caps each megakernel call's per-PROGRAM grid total at
    _MAX_PROGRAM_GRID, counting the GATED per-epoch size spe_pad for
    divisor-less spe; below the boundary chunks pass through."""
    from types import SimpleNamespace

    from pigan_thz_tpu.train.trainer import Trainer

    cap = lambda spe, chunk: Trainer._mega_gan_chunk_cap(
        SimpleNamespace(steps_per_epoch=spe), chunk
    )
    assert cap(15, 25) == 25          # default shape: untouched
    assert cap(15, 100) == 100        # bench chunk: 1500, single launch
    assert cap(15, 300) == 250        # program-grid cap 3750 // spe
    assert cap(312, 25) == 12         # 20k corpus @ B=64: single 3744
    assert cap(313, 25) == 11         # prime spe: single launch, no pad
    assert cap(1440, 25) == 2
    assert cap(80, 1) == 1            # already single-epoch


@pytest.mark.slow
def test_megakernel_sub_epoch_launch_parity(cfg, monkeypatch):
    """Sub-epoch decomposition (spe > multi-launch grid cap, round 3):
    each epoch splits into uniform launches of a divisor of spe; partial
    metric rows sum back into exact per-epoch means and the state matches
    the XLA trajectory.  Caps are monkeypatched small so interpret mode
    stays cheap (spe=6, launches of 3)."""
    from pigan_thz_tpu.ops import megakernel as MK

    monkeypatch.setattr(MK, "_MAX_GRID", 8)
    monkeypatch.setattr(MK, "_MAX_GRID_MULTI", 5)
    monkeypatch.setattr(MK, "_MIN_SUB_LAUNCH", 2)
    assert MK._launch_plan(2, 6) == (3, 4, 3, 6)  # 2 rows/epoch, summed
    ds, state, xla, pallas = _setup(cfg, 384)     # batch 64 -> spe=6
    state_b = jax.tree.map(jnp.copy, state)
    scales = jnp.ones((2,), jnp.float32)
    key = jax.random.PRNGKey(23)
    st_x, m_x = xla(state, ds, key, scales)
    st_p, m_p = pallas(state_b, ds, key, scales)
    for k in METRIC_KEYS:
        # d_accuracy and violation_rate are 1/384-quantized and
        # discontinuous: backend fp-ordering noise flips knife-edge
        # samples (same allowance as the resume-shape test); the smooth
        # losses stay tight
        atol = 2.0 / 64 if k in ("d_accuracy", "violation_rate") else 1e-6
        np.testing.assert_allclose(
            np.asarray(m_p[k]), np.asarray(m_x[k]), rtol=5e-4, atol=atol,
            err_msg=k,
        )
    assert int(st_p.g_opt[1][0].count) == int(st_x.g_opt[1][0].count) == 12


@pytest.mark.slow
def test_megakernel_gated_padding_parity(cfg, monkeypatch):
    """Divisor-less spe (round 3): each epoch pads to spe_pad grid steps
    with live=0 tail steps that the kernel gates into complete no-ops —
    params/moments/BN stats/metrics must match the XLA trajectory exactly.
    Caps monkeypatched small: spe=7 (prime > multi-launch cap 5) pads to
    8 with launches of 4."""
    from pigan_thz_tpu.ops import megakernel as MK

    monkeypatch.setattr(MK, "_MAX_GRID", 8)
    monkeypatch.setattr(MK, "_MAX_GRID_MULTI", 5)
    monkeypatch.setattr(MK, "_MIN_SUB_LAUNCH", 2)
    assert MK._launch_plan(2, 7) == (4, 4, 4, 8)
    ds, state, xla, pallas = _setup(cfg, 448)     # batch 64 -> spe=7
    state_b = jax.tree.map(jnp.copy, state)
    scales = jnp.ones((2,), jnp.float32)
    key = jax.random.PRNGKey(29)
    st_x, m_x = xla(state, ds, key, scales)
    st_p, m_p = pallas(state_b, ds, key, scales)
    for k in METRIC_KEYS:
        atol = 2.0 / 64 if k in ("d_accuracy", "violation_rate") else 1e-6
        np.testing.assert_allclose(
            np.asarray(m_p[k]), np.asarray(m_x[k]), rtol=5e-4, atol=atol,
            err_msg=k,
        )
    # padded steps must not advance the trajectory: same params (modulo
    # the BN-gauge biases — see module docstring), same counts.  The BN
    # running stats absorb the gauge drift, so `extra` gets the same
    # looser bound as the engagement test above.
    for x, y in zip(jax.tree.leaves(st_x.d.params), jax.tree.leaves(st_p.d.params)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0, atol=5e-4)
    for x, y in zip(jax.tree.leaves(st_x.g.extra), jax.tree.leaves(st_p.g.extra)):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0, atol=8e-3)
    for (path, x), y in zip(
        jax.tree_util.tree_flatten_with_path(st_x.g.params)[0],
        jax.tree.leaves(st_p.g.params),
    ):
        if _leafname(path) in _GAUGE:
            continue
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=0, atol=5e-4, err_msg=_leafname(path)
        )
    assert int(st_p.g_opt[1][0].count) == int(st_x.g_opt[1][0].count) == 14


@pytest.mark.slow
def test_megakernel_gated_padding_full_surface(cfg, monkeypatch):
    """Gated padding composed with the stochastic/EMA knobs: the live gate
    must also hold for EMA lerps and the precomputed noise streams (which
    stay indexed by REAL step)."""
    import dataclasses as _dc

    from pigan_thz_tpu.ops import megakernel as MK
    from pigan_thz_tpu.train.steps import StepSettings

    monkeypatch.setattr(MK, "_MAX_GRID", 8)
    monkeypatch.setattr(MK, "_MAX_GRID_MULTI", 5)
    monkeypatch.setattr(MK, "_MIN_SUB_LAUNCH", 2)
    settings = StepSettings.from_config(
        cfg, ema_decay=0.9, instance_noise=0.05, d_update_every=2,
    )
    st_x, m_x, st_p, m_p = _setup2(cfg, 448, settings)  # spe=7 -> pad to 8
    _assert_metric_parity(m_x, m_p)
    _assert_param_parity(st_x, st_p)
    for (path, x), y in zip(
        jax.tree_util.tree_flatten_with_path(st_x.g_ema)[0],
        jax.tree.leaves(st_p.g_ema),
    ):
        if _leafname(path) in _GAUGE:
            continue
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=0, atol=3e-3,
            err_msg=f"g_ema:{_leafname(path)}",
        )
    assert int(st_p.d_opt[1][0].count) == int(st_x.d_opt[1][0].count)


@pytest.mark.slow
def test_megakernel_resume_shape_parity(cfg, monkeypatch):
    """Parity over the E=25 launch pattern that corrupted on hardware when
    mixed-shape (interpret mode; spe=1 keeps it cheap): 25 epochs decompose
    into 5 uniform launches of 5 and match the XLA trajectory."""
    from pigan_thz_tpu.ops import megakernel as MK

    monkeypatch.setattr(MK, "_MAX_GRID", 8)
    assert MK._launch_plan(25, 1) == (5, 5, 1, 1)
    ds, state, xla, pallas = _setup(cfg, 64)  # batch 64 -> spe=1
    state_b = jax.tree.map(jnp.copy, state)
    scales = jnp.ones((25,), jnp.float32)
    key = jax.random.PRNGKey(17)
    st_x, m_x = xla(state, ds, key, scales)
    st_p, m_p = pallas(state_b, ds, key, scales)
    for k in METRIC_KEYS:
        # tolerances sized for a 25-EPOCH trajectory: backend fp-ordering
        # noise compounds through the adversarial dynamics (~0.3% on
        # adv_loss by epoch 25, up to ~3e-3 absolute on the tiny lc_loss),
        # and d_accuracy is discontinuous (1/64 jumps on knife-edge
        # samples).  A structural decomposition error would give O(1)
        # divergence, which these still catch.
        atol = 2.0 / 64 if k == "d_accuracy" else 5e-3
        np.testing.assert_allclose(
            np.asarray(m_p[k]), np.asarray(m_x[k]), rtol=2e-2, atol=atol, err_msg=k
        )
    assert int(st_p.g_opt[1][0].count) == int(st_x.g_opt[1][0].count) == 25


# ---------------------------------------------------------------------------
# Round-3 envelope extension: program-phase knobs in-kernel
# ---------------------------------------------------------------------------


def _setup2(cfg, num_samples, settings, epochs=2, key=11):
    """Run XLA and Pallas (interpret) trajectories from identical states
    with arbitrary StepSettings; returns (st_x, m_x, st_p, m_p)."""
    c = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=num_samples))
    ds = synthetic_dataset(c.data)
    g, d, f = build_trio(c)
    spe = ds.num_samples // c.train.batch_size
    g_tx, d_tx, _ = make_optimizers(c, spe)
    state = init_pigan_state(
        g, d, f, g_tx, d_tx, jax.random.PRNGKey(1),
        ema=settings.ema_decay > 0,
    )
    state_b = jax.tree.map(jnp.copy, state)
    step = make_pigan_step(g, d, f, g_tx, d_tx, settings, ds.param_lo, ds.param_hi)
    xla = make_multi_epoch_fn(step, c.train.batch_size, with_scale=True, unroll=1)
    pallas = make_pallas_multi_epoch_fn(c, settings, interpret=True)
    scales = jnp.linspace(0.5, 2.0, epochs).astype(jnp.float32)
    k = jax.random.PRNGKey(key)
    st_x, m_x = xla(state, ds, k, scales)
    st_p, m_p = pallas(state_b, ds, k, scales)
    return st_x, m_x, st_p, m_p


def _assert_metric_parity(m_x, m_p, rtol=3e-3, atol=1e-6, skip=("d_accuracy",)):
    """Multi-epoch metric closeness.  rtol is sized for benign fp-ordering
    drift compounding over 2 epochs of adversarial dynamics (measured
    ~6e-4 by epoch 2 on the extended-loss combos, while first-STEP
    gradient parity is ~8e-6 — _assert_grad_parity is the strict check;
    structural adjoint errors give O(1) metric divergence)."""
    assert set(m_p) == set(m_x)
    for k in m_x:
        if k in skip:
            continue
        np.testing.assert_allclose(
            np.asarray(m_p[k]), np.asarray(m_x[k]), rtol=rtol, atol=atol, err_msg=k
        )


def _assert_grad_parity(cfg, settings, tol=1e-4, num_samples=64):
    """STRICT first-step check: implied gradients (first Adam mu) of every
    non-gauge tensor agree to `tol` at tensor-norm scale."""
    c = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=num_samples))
    ds = synthetic_dataset(c.data)
    g, d, f = build_trio(c)
    spe = ds.num_samples // c.train.batch_size
    g_tx, d_tx, _ = make_optimizers(c, spe)
    state = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(1))
    state_b = jax.tree.map(jnp.copy, state)
    step = make_pigan_step(g, d, f, g_tx, d_tx, settings, ds.param_lo, ds.param_hi)
    xla = make_multi_epoch_fn(step, c.train.batch_size, with_scale=True, unroll=1)
    pallas = make_pallas_multi_epoch_fn(c, settings, interpret=True)
    ones = jnp.ones((1,), jnp.float32)
    st_x, _ = xla(state, ds, jax.random.PRNGKey(3), ones)
    st_p, _ = pallas(state_b, ds, jax.random.PRNGKey(3), ones)
    for net in ("g", "d"):
        mx = jax.tree_util.tree_flatten_with_path(
            getattr(st_x, f"{net}_opt")[1][0].mu
        )[0]
        mp = jax.tree.leaves(getattr(st_p, f"{net}_opt")[1][0].mu)
        for (path, x), y in zip(mx, mp):
            if net == "g" and _leafname(path) in _GAUGE:
                continue
            x = np.asarray(x, np.float64)
            y = np.asarray(y, np.float64)
            nrm = max(np.linalg.norm(x), 1e-12)
            assert np.linalg.norm(x - y) / nrm < tol, f"{net}:{_leafname(path)}"


def _assert_param_parity(st_x, st_p, atol=3e-3):
    # atol covers Adam's ±lr-scale amplification of backend fp sign flips
    # on knife-edge branch points (relu masks, |.| signs) over a 2-epoch
    # run; _assert_grad_parity is the strict (first-step, 1e-4 norm-scale)
    # correctness check and structural errors fail BOTH at O(1).
    for net in ("g", "d"):
        for (path, x), y in zip(
            jax.tree_util.tree_flatten_with_path(getattr(st_x, net).params)[0],
            jax.tree.leaves(getattr(st_p, net).params),
        ):
            if net == "g" and _leafname(path) in _GAUGE:
                continue
            np.testing.assert_allclose(
                np.asarray(y), np.asarray(x), rtol=0, atol=atol,
                err_msg=f"{net}:{_leafname(path)}",
            )


@pytest.mark.slow
def test_megakernel_d_update_every(cfg):
    """d_update_every=2: D's optimizer steps/schedule/bias corrections only
    advance on update steps; skipped steps leave D untouched (XLA
    skip-branch parity)."""
    s = StepSettings.from_config(cfg, d_update_every=2)
    st_x, m_x, st_p, m_p = _setup2(cfg, 128, s)  # spe=2, T=4: updates at 0,2
    _assert_metric_parity(m_x, m_p)
    _assert_param_parity(st_x, st_p)
    assert int(st_p.d_opt[1][0].count) == int(st_x.d_opt[1][0].count) == 2
    assert int(st_p.d_opt[1][1].count) == 2
    assert int(st_p.g_opt[1][0].count) == 4


@pytest.mark.slow
def test_megakernel_window_loss(cfg):
    """window_w (unified_trainer.py:240-256 semantics as invoked by
    steps.py): batch-SUM resonance-window penalty on f1; gradient reaches
    G only through F (non-detach)."""
    s = StepSettings.from_config(cfg, window_w=0.5, detach_forward=False)
    st_x, m_x, st_p, m_p = _setup2(cfg, 128, s)
    _assert_metric_parity(m_x, m_p)
    _assert_param_parity(st_x, st_p)
    _assert_grad_parity(cfg, s)
    # detach mode: the loss VALUE still enters g_loss, gradient does not
    s_d = StepSettings.from_config(cfg, window_w=0.5)
    st_x, m_x, st_p, m_p = _setup2(cfg, 128, s_d)
    _assert_metric_parity(m_x, m_p)
    _assert_param_parity(st_x, st_p)


@pytest.mark.slow
def test_megakernel_stability_loss(cfg):
    """stability_w: noise stream precomputed from the EXACT XLA key chain
    (k_noise of the 9-way split), second G pass + hand adjoint through
    both branches of the MSE."""
    s = StepSettings.from_config(cfg, stability_w=0.8)
    st_x, m_x, st_p, m_p = _setup2(cfg, 128, s)
    _assert_metric_parity(m_x, m_p)
    _assert_param_parity(st_x, st_p)
    _assert_grad_parity(cfg, s)


@pytest.mark.slow
def test_megakernel_instance_noise_and_augment(cfg):
    """instance_noise (D-input spectrum noise, steps.py:295-298) and data
    augmentation (applied to the spectrum stream outside the kernel):
    both use bitwise-identical key chains, so parity is exact."""
    s = StepSettings.from_config(cfg, instance_noise=0.05)
    st_x, m_x, st_p, m_p = _setup2(cfg, 128, s)
    _assert_metric_parity(m_x, m_p)
    _assert_param_parity(st_x, st_p)
    _assert_grad_parity(cfg, s)
    s_a = StepSettings.from_config(
        cfg, augment_noise=0.05, augment_shift=0.02, augment_scale=0.1
    )
    st_x, m_x, st_p, m_p = _setup2(cfg, 128, s_a)
    _assert_metric_parity(m_x, m_p)
    _assert_param_parity(st_x, st_p)


@pytest.mark.slow
def test_megakernel_optimized_overlay_combo(cfg):
    """The OptimizedTrainer overlay's full knob set (instance noise +
    stability + window + constraint) runs in ONE kernel with XLA parity —
    every reference trainer variant's loss surface is now in-envelope."""
    s = StepSettings.from_config(
        cfg, instance_noise=0.05, stability_w=0.3, window_w=0.2,
        constraint_w=1.0, detach_forward=False,
    )
    st_x, m_x, st_p, m_p = _setup2(cfg, 128, s)
    _assert_metric_parity(m_x, m_p)
    _assert_param_parity(st_x, st_p)
    _assert_grad_parity(cfg, s)


@pytest.mark.slow
def test_megakernel_wgan_gp(cfg):
    """gan_loss='wgan_gp': Wasserstein critic loss + gradient penalty with
    a HAND-DERIVED second-order backward (leaky-relu masks are piecewise
    constant, so grad-of-grad keeps them fixed — exactly what XLA's
    autodiff computes).  eps stream from the exact k_gp chain."""
    s = StepSettings.from_config(cfg)
    s = dataclasses.replace(s, gan_loss="wgan_gp", gp_weight=10.0)
    st_x, m_x, st_p, m_p = _setup2(cfg, 128, s)
    _assert_metric_parity(m_x, m_p)
    _assert_param_parity(st_x, st_p)
    _assert_grad_parity(cfg, s)
    # skip-gated: the reported critic loss omits gp on skip steps
    s2 = dataclasses.replace(s, d_update_every=2)
    st_x, m_x, st_p, m_p = _setup2(cfg, 128, s2)
    _assert_metric_parity(m_x, m_p)
    _assert_param_parity(st_x, st_p)


@pytest.mark.slow
def test_megakernel_ema_track(cfg):
    """ema_decay > 0 (round 3): the in-kernel VMEM-resident G-EMA lerp
    matches the XLA track leafwise (post-update params, per step), and the
    non-EMA state is unchanged by the extra buffers."""
    s = StepSettings.from_config(cfg)
    s = dataclasses.replace(s, ema_decay=0.97)
    st_x, m_x, st_p, m_p = _setup2(cfg, 128, s)
    _assert_metric_parity(m_x, m_p)
    _assert_param_parity(st_x, st_p)
    assert st_p.g_ema is not None
    for (path, x), y in zip(
        jax.tree_util.tree_flatten_with_path(st_x.g_ema)[0],
        jax.tree.leaves(st_p.g_ema),
    ):
        if _leafname(path) in _GAUGE:
            continue
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=0, atol=3e-3,
            err_msg=f"g_ema:{_leafname(path)}",
        )
    # EMA stays between init and current params (a lerp, not a copy)
    lx = jax.tree.leaves(st_p.g_ema)
    lp = jax.tree.leaves(st_p.g.params)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(lx, lp)
    )


@pytest.mark.slow
def test_megakernel_constraint_annealed(cfg):
    """constraint_w with a non-trivial annealing scale stream: the enhanced
    constraint loss (hard/boundary/smooth/validity) and its hand adjoint
    match XLA, including the constraint_loss metric lane."""
    s = StepSettings.from_config(cfg, constraint_w=10.0, detach_forward=False)
    st_x, m_x, st_p, m_p = _setup2(cfg, 128, s)
    assert "constraint_loss" in m_p
    _assert_metric_parity(m_x, m_p)
    _assert_param_parity(st_x, st_p)
    _assert_grad_parity(cfg, s)



@pytest.mark.slow
def test_megakernel_sigmoid_squash(cfg):
    """sigmoid_squash (constraint_optimizer.py:246 semantics): sigmoid
    output + its derivative, padded-lane masking keeps range/violation
    exact (sigmoid pads are 0.5, not 0)."""
    s = StepSettings.from_config(cfg, sigmoid_squash=True)
    st_x, m_x, st_p, m_p = _setup2(cfg, 128, s)
    _assert_metric_parity(m_x, m_p)
    _assert_param_parity(st_x, st_p)
    _assert_grad_parity(cfg, s)



@pytest.mark.slow
@pytest.mark.parametrize("detach", [True, False])
def test_megakernel_cycle_consistency(cfg, detach):
    """cycle_w: the second G pass (BN batch stats of the cycled batch) and
    its full backward — both-args gradient, weight-grad accumulation
    across passes, and the recon input path when gradients flow through F."""
    s = StepSettings.from_config(cfg, cycle_w=1.0, detach_forward=detach)
    st_x, m_x, st_p, m_p = _setup2(cfg, 128, s)
    _assert_metric_parity(m_x, m_p)
    _assert_param_parity(st_x, st_p)
    _assert_grad_parity(cfg, s)



@pytest.mark.slow
def test_megakernel_constraint_finetune_settings(cfg):
    """The constraint_finetune phase settings (sigmoid + constraint 50 +
    D every 3) run in one kernel — the reference's constraint_optimizer
    semantics on the fast path."""
    s = StepSettings.from_config(
        cfg, adv_w=1.0, recon_w=20.0, physics_spec_w=0.0, constraint_w=50.0,
        range_w=10.0, sigmoid_squash=True, d_update_every=3,
        detach_forward=False,
    )
    st_x, m_x, st_p, m_p = _setup2(cfg, 128, s)
    _assert_metric_parity(m_x, m_p, rtol=1e-3)
    _assert_param_parity(st_x, st_p)
    assert int(st_p.d_opt[1][0].count) == int(st_x.d_opt[1][0].count) == 2
    _assert_grad_parity(cfg, s)



@pytest.mark.slow
def test_megakernel_emergency_settings(cfg):
    """The emergency_balanced_gan phase settings (adv 0.1, cycle, D every
    2, through-F gradients) — the emergency pipeline's GAN phases fit the
    kernel envelope."""
    s = StepSettings.from_config(
        cfg, adv_w=0.1, recon_w=10.0, physics_spec_w=2.0, cycle_w=1.0,
        d_update_every=2, detach_forward=False,
    )
    st_x, m_x, st_p, m_p = _setup2(cfg, 128, s)
    # rtol 5e-3: the richest combo (cycle + through-F + D-gating)
    # compounds benign fp-ordering drift fastest — measured 3.1e-3 on
    # epoch-2 lc_loss after the vector-head reduction-order change, while
    # first-step gradients stay at 1e-4 (checked below, the strict gate)
    _assert_metric_parity(m_x, m_p, rtol=5e-3)
    _assert_param_parity(st_x, st_p)
    _assert_grad_parity(cfg, s)



@pytest.mark.slow
@pytest.mark.parametrize("sched_kind", ["linear", "warmup_cosine"])
def test_megakernel_optimizer_override_parity(cfg, sched_kind):
    """Per-phase lr/schedule override (emergency lr_d=5e-5 pattern; the
    round-5 scaled-batch warmup_cosine): Trainer(megakernel='force') with
    overrides matches the XLA trainer with identical overrides."""
    from pigan_thz_tpu.data import synthetic_dataset as synth
    from pigan_thz_tpu.train import Trainer

    c = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=128))
    ds = synth(c.data)
    kw = dict(epochs=2, log_every=10**9, lr_d=5e-5, lr_g=1e-4,
              schedule_g=sched_kind, schedule_d=sched_kind)
    t_p = Trainer(c, ds=ds, epochs_per_call=2, megakernel="force")
    t_p.init_pigan()
    t_p.train_pigan(**kw)
    assert any(k[0] == "gan-mega" and k[2] is not None for k in t_p._epoch_fns)
    t_x = Trainer(c, ds=ds, epochs_per_call=2, megakernel="off")
    t_x.init_pigan()
    t_x.train_pigan(**kw)
    for k, v in t_x.train_history.items():
        if "accuracy" in k:
            continue
        np.testing.assert_allclose(
            np.asarray(t_p.train_history[k]), np.asarray(v),
            rtol=5e-4, atol=1e-6, err_msg=k,
        )


@pytest.mark.slow
def test_program_phases_engage_megakernel(cfg):
    """The canonical reference programs (standard -> constraint ->
    emergency) run END TO END with megakernel='force' (interpret mode):
    every GAN phase's settings now fit the kernel envelope, including the
    per-phase lr_d override of emergency_balanced_gan, with zero
    reliability-net trips."""
    from pigan_thz_tpu.data import synthetic_dataset as synth
    from pigan_thz_tpu.train import Trainer
    from pigan_thz_tpu.train.programs import (
        constraint_phase,
        emergency_phases,
        run_program,
        standard_phases,
    )

    c = cfg.replace(
        data=dataclasses.replace(cfg.data, num_samples=128),
        forward_model=dataclasses.replace(cfg.forward_model, dropout_rate=0.0),
    )
    ds = synth(c.data)
    t = Trainer(c, ds=ds, epochs_per_call=2, megakernel="force")
    phases = [
        *standard_phases(forward_epochs=2, gan_epochs=2),
        constraint_phase(2),
        *emergency_phases(forward_epochs=2, warmup_epochs=2, gan_epochs=2),
    ]
    result = run_program(t, phases, log_every=10**9)
    assert "gan_standard" in result.phases_run
    gan_keys = [k for k in t._epoch_fns if k[0] == "gan-mega"]
    # standard + (gated) constraint/emergency GAN phases each compiled a
    # distinct megakernel; at minimum the ungated standard phase did
    assert len(gan_keys) >= 1
    assert t.fallback_trips == 0
    assert all(
        np.isfinite(np.asarray(v)).all() for v in t.train_history.values()
    )


@pytest.mark.slow
def test_fused_prologue_forensic_paths_match_split(cfg, monkeypatch):
    """_FUSED_PROLOGUE=True (the forensic single-program shape: XLA
    prologue fused with the aliased pallas_call — the v5e corruption
    trigger, RESULTS.md round-3 root cause) must stay compilable and
    match the default split-program drivers in interpret mode, for BOTH
    kernels: the corruption it reproduces is a hardware compilation
    artifact, not a math difference."""
    import pigan_thz_tpu.ops.megakernel as MK

    # GAN kernel
    ds, state, _, split_fn = _setup(cfg, 128)
    key, ones = jax.random.PRNGKey(3), jnp.ones((2,), jnp.float32)
    st_s, m_s = split_fn(jax.tree.map(jnp.copy, state), ds, key, ones)
    monkeypatch.setattr(MK, "_FUSED_PROLOGUE", True)
    settings = StepSettings.from_config(cfg, detach_forward=True)
    c128 = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=128))
    fused_fn = make_pallas_multi_epoch_fn(c128, settings, interpret=True)
    st_f, m_f = fused_fn(jax.tree.map(jnp.copy, state), ds, key, ones)
    for k in METRIC_KEYS:
        np.testing.assert_allclose(
            np.asarray(m_f[k]), np.asarray(m_s[k]), rtol=1e-6, err_msg=k)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(st_s.g.params)[0],
        jax.tree.leaves(st_f.g.params),
    ):
        if _leafname(path) in _GAUGE:
            continue
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=1e-6,
            err_msg=_leafname(path))

    # forward kernel
    cf = c128.replace(
        forward_model=dataclasses.replace(cfg.forward_model, dropout_rate=0.0))
    dsf = synthetic_dataset(cf.data)
    _, _, f = build_trio(cf)
    _, _, f_tx = make_optimizers(cf, dsf.num_samples // cf.train.batch_size)
    st0 = init_forward_state(f, f_tx, jax.random.PRNGKey(2))
    monkeypatch.setattr(MK, "_FUSED_PROLOGUE", False)
    split_fwd = make_pallas_forward_epoch_fn(cf, ForwardStepSettings(),
                                             interpret=True)
    st_sf, m_sf = split_fwd(jax.tree.map(jnp.copy, st0), dsf, key, ones)
    monkeypatch.setattr(MK, "_FUSED_PROLOGUE", True)
    fused_fwd = make_pallas_forward_epoch_fn(cf, ForwardStepSettings(),
                                             interpret=True)
    st_ff, m_ff = fused_fwd(jax.tree.map(jnp.copy, st0), dsf, key, ones)
    for k in FWD_METRIC_KEYS:
        np.testing.assert_allclose(
            np.asarray(m_ff[k]), np.asarray(m_sf[k]), rtol=1e-6, err_msg=k)
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(st_sf.f.params)[0],
        jax.tree.leaves(st_ff.f.params),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=1e-6,
            err_msg=_leafname(path))


# ---------------------------------------------------------------------------
# bf16 Adam-moment storage (train.adam_state_dtype="bfloat16") is XLA-only:
# carrying narrow moments in the kernels required splitting the packed
# (3, r, c) state buffers into param/moment planes, which DOUBLED the
# aliased operand count and miscompiled both kernels on v5e (round-3d root
# cause: deterministic small-grid NaNs + finite-but-wrong forward training,
# exact in interpret mode — RESULTS.md).  The support gates route the mode
# onto the XLA path (schedules.scale_by_adam_bf16) instead.
# ---------------------------------------------------------------------------


def test_bf16_adam_state_is_xla_only(cfg):
    c = cfg.replace(
        train=dataclasses.replace(cfg.train, adam_state_dtype="bfloat16")
    )
    reason = supports_megakernel(c, StepSettings.from_config(c))
    assert reason is not None and "adam_state_dtype" in reason
    reason_f = supports_forward_megakernel(c)
    assert reason_f is not None and "adam_state_dtype" in reason_f


@pytest.mark.slow
def test_bf16_adam_state_trains_on_xla_path(cfg):
    """Trainer(megakernel='auto') under bf16 moments silently takes the
    XLA path (scale_by_adam_bf16) and trains finite with bf16-stored
    moments; 'force' raises the gate reason instead of engaging."""
    from pigan_thz_tpu.train.trainer import Trainer

    c = cfg.replace(
        data=dataclasses.replace(cfg.data, num_samples=128),
        train=dataclasses.replace(cfg.train, adam_state_dtype="bfloat16"),
    )
    t = Trainer(c, megakernel="auto")
    t.pretrain_forward(epochs=2, log_every=10**9)
    st = t.forward_state
    assert st.opt[1][0].mu["MLPBlock_0"]["Dense_0"]["kernel"].dtype == jnp.bfloat16
    assert np.isfinite(t.train_history["forward/loss"][-1])
    assert not any(k[0] in ("fwd-mega", "gan-mega") for k in t._epoch_fns)
    with pytest.raises(ValueError, match="adam_state_dtype"):
        Trainer(c, megakernel="force").pretrain_forward(
            epochs=1, log_every=10**9)


# ---------------------------------------------------------------------------
# Step packing (_PACK_MAX): K training steps per grid iteration
# ---------------------------------------------------------------------------


def test_pack_must_divide_row_steps():
    import pigan_thz_tpu.ops.megakernel as MK

    with pytest.raises(ValueError, match="pack"):
        MK._make_kernel(250, 64, 15, StepSettings(), 1.0, pack=4)
    with pytest.raises(ValueError, match="pack"):
        MK._make_forward_kernel(
            250, 64, 15, ForwardStepSettings(), 1.0, dropout_rate=0.0, pack=4
        )


def test_pack_parity_gan(cfg, monkeypatch):
    """Packed launches (K steps per grid iteration) are the SAME program
    as unpacked ones: identical per-step math against VMEM-resident state,
    so params/moments come out bit-identical; per-epoch metric rows differ
    only in summation order (divide-then-add vs add-then-divide, ~1 ulp)."""
    import pigan_thz_tpu.ops.megakernel as MK

    c = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=256))
    ds = synthetic_dataset(c.data)
    g, d, f = build_trio(c)
    spe = ds.num_samples // c.train.batch_size          # 4
    g_tx, d_tx, _ = make_optimizers(c, spe)
    settings = StepSettings.from_config(c)
    st0 = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(1))
    key, ones = jax.random.PRNGKey(7), jnp.ones((3,), jnp.float32)

    def run(pack_max):
        # re-arm packing (default _MIN_CLEAN_GRID=1 never packs)
        monkeypatch.setattr(MK, "_MIN_CLEAN_GRID", 120)
        monkeypatch.setattr(MK, "_PACK_MAX", pack_max)
        fn = make_pallas_multi_epoch_fn(c, settings, interpret=True)
        return fn(jax.tree.map(jnp.copy, st0), ds, key, ones)

    st1, m1 = run(1)
    st4, m4 = run(8)                                     # pack = 4
    for k in METRIC_KEYS:
        np.testing.assert_allclose(
            np.asarray(m4[k]), np.asarray(m1[k]), rtol=2e-6, err_msg=k
        )
    for tree1, tree4 in (
        (st1.g.params, st4.g.params), (st1.d.params, st4.d.params),
        (st1.g_opt[1][0].mu, st4.g_opt[1][0].mu),
        (st1.d_opt[1][0].nu, st4.d_opt[1][0].nu),
        (st1.g.extra["batch_stats"], st4.g.extra["batch_stats"]),
    ):
        for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(tree1)[0],
            jax.tree.leaves(tree4),
        ):
            np.testing.assert_array_equal(
                np.asarray(b), np.asarray(a), err_msg=_leafname(path)
            )


def test_pack_parity_forward(cfg, monkeypatch):
    """Forward kernel packing is bit-identical.  (Dropout keeps the same
    bitstream too — the hardware PRNG re-seeds from the per-step seed
    stream at the top of every packed step exactly like consecutive grid
    steps — but pltpu.prng_seed has no CPU interpret lowering, so like
    every interpret-mode forward parity test this runs dropout 0.)"""
    import pigan_thz_tpu.ops.megakernel as MK

    c = cfg.replace(
        data=dataclasses.replace(cfg.data, num_samples=256),
        forward_model=dataclasses.replace(cfg.forward_model, dropout_rate=0.0),
    )
    ds = synthetic_dataset(c.data)
    _, _, f = build_trio(c)
    spe = ds.num_samples // c.train.batch_size
    _, _, f_tx = make_optimizers(c, spe)
    st0 = init_forward_state(f, f_tx, jax.random.PRNGKey(2))
    fset = ForwardStepSettings()
    key, ones = jax.random.PRNGKey(5), jnp.ones((2,), jnp.float32)

    def run(pack_max):
        # re-arm packing (default _MIN_CLEAN_GRID=1 never packs)
        monkeypatch.setattr(MK, "_MIN_CLEAN_GRID", 120)
        monkeypatch.setattr(MK, "_PACK_MAX", pack_max)
        fn = make_pallas_forward_epoch_fn(c, fset, interpret=True)
        return fn(jax.tree.map(jnp.copy, st0), ds, key, ones)

    st1, m1 = run(1)
    st4, m4 = run(8)
    for k in FWD_METRIC_KEYS:
        np.testing.assert_allclose(
            np.asarray(m4[k]), np.asarray(m1[k]), rtol=2e-6, err_msg=k
        )
    for (path, a), b in zip(
        jax.tree_util.tree_flatten_with_path(st1.f.params)[0],
        jax.tree.leaves(st4.f.params),
    ):
        np.testing.assert_array_equal(
            np.asarray(b), np.asarray(a), err_msg=_leafname(path)
        )


# ---------------------------------------------------------------------------
# Small-grid miscompile envelope: _resolve_pack / small_grid_risk / routing
# ---------------------------------------------------------------------------


def test_resolve_pack_default_never_packs():
    """Post-root-cause default (_MIN_CLEAN_GRID=1): every grid runs
    pack=1 and no shape is routed off the kernel — the packed (3, r, c)
    buffer layout made the round-3b small-grid NaN class vanish."""
    import pigan_thz_tpu.ops.megakernel as MK

    for ls, rs in ((15, 15), (26, 13), (60, 15), (120, 15), (1500, 15)):
        assert MK._resolve_pack(ls, rs) == 1
    assert MK.small_grid_risk(1, 15) is None
    assert MK.small_grid_risk(2, 13) is None
    assert MK.small_grid_risk_forward(2, 13) is None


def test_resolve_pack_rule(monkeypatch):
    """The re-armable defense (raised _MIN_CLEAN_GRID): pack=1 at or
    above the threshold (full speed); below it the largest row_steps
    divisor <= _PACK_MAX; 1 + small grid = the shape the Trainer must
    route off the kernel."""
    import pigan_thz_tpu.ops.megakernel as MK

    monkeypatch.setattr(MK, "_MIN_CLEAN_GRID", 120)
    assert MK._resolve_pack(120, 15) == 1          # at the boundary: fast path
    assert MK._resolve_pack(1500, 15) == 1         # bench shape
    assert MK._resolve_pack(15, 15) == 5           # E=1 tail at spe=15
    assert MK._resolve_pack(60, 15) == 5           # E=4 tail
    assert MK._resolve_pack(26, 13) == 1           # prime rs: CANNOT pack
    assert MK._resolve_pack(8, 8) == 8


def test_small_grid_risk(monkeypatch):
    import pigan_thz_tpu.ops.megakernel as MK

    monkeypatch.setattr(MK, "_MIN_CLEAN_GRID", 120)
    assert MK.small_grid_risk(2, 15) is None       # packs (pack=5)
    assert MK.small_grid_risk(25, 15) is None      # grid 375 >= 120
    assert MK.small_grid_risk(9, 13) is not None   # 117 < 120, prime rs
    assert MK.small_grid_risk(10, 13) is None      # 130 >= 120
    msg = MK.small_grid_risk(2, 13)
    assert msg is not None and "26" in msg
    # forward variant mirrors the rule on the whole-epoch driver's plan
    assert MK.small_grid_risk_forward(2, 13) is not None
    assert MK.small_grid_risk_forward(25, 15) is None
    assert MK.small_grid_risk_forward(1, MK._FWD_MAX_TOTAL + 1) is None  # sub


def test_trainer_small_grid_routes(cfg, capsys, monkeypatch):
    """Route planning under a re-armed threshold (monkeypatched
    _MIN_CLEAN_GRID=120; the post-root-cause default routes nothing):
    spe=13 (prime, no pack divisor) makes a 2-epoch chunk fall in the
    miscompile class -> force raises UP-FRONT; the planner marks the
    same chunk for the XLA route when the kernel is engaged."""
    import pigan_thz_tpu.ops.megakernel as MK
    from pigan_thz_tpu.data import synthetic_dataset as synth
    from pigan_thz_tpu.train import Trainer

    monkeypatch.setattr(MK, "_MIN_CLEAN_GRID", 120)
    c = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=13 * 64))
    ds = synth(c.data)
    t = Trainer(c, ds=ds, epochs_per_call=2, megakernel="force")
    t.init_pigan()
    with pytest.raises(ValueError, match="small-grid"):
        t.train_pigan(epochs=2, log_every=10**9)
    # planner: chunks of 25 are fine, a 2-epoch tail at spe=13 is routed
    t2 = Trainer(c, ds=ds, epochs_per_call=25, megakernel="off")
    assert t2._plan_small_grid_routes(27, forward=False) == {25}
    assert t2._plan_small_grid_routes(50, forward=False) == set()
    with pytest.raises(ValueError, match="small-grid"):
        t2.megakernel = "force"
        t2._plan_small_grid_routes(27, forward=False)
    # packable spe (15): no routes anywhere
    c3 = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=15 * 64))
    t3 = Trainer(c3, ds=synth(c3.data), epochs_per_call=25, megakernel="off")
    assert t3._plan_small_grid_routes(27, forward=False) == set()
    assert t3._plan_small_grid_routes(27, forward=True) == set()


def test_trainer_force_engages_with_packable_tail(cfg):
    """spe=15 dataset, 3-epoch run under force: the chunk packs (pack=5)
    instead of raising or routing -- the megakernel covers the whole run."""
    from pigan_thz_tpu.data import synthetic_dataset as synth
    from pigan_thz_tpu.train import Trainer

    c = cfg.replace(data=dataclasses.replace(cfg.data, num_samples=128))
    ds = synth(c.data)
    t = Trainer(c, ds=ds, epochs_per_call=25, megakernel="force")
    t.init_pigan()
    t.train_pigan(epochs=3, log_every=10**9)
    assert any(k[0] == "gan-mega" for k in t._epoch_fns)
    assert t.fallback_trips == 0
    assert len(t.train_history["pigan/d_loss"]) == 3
