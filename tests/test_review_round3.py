"""Regression tests for the round-3 code-review findings."""

import dataclasses

import jax
import numpy as np
import pytest

from pigan_thz_tpu.data import synthetic_dataset
from pigan_thz_tpu.train import Trainer
from pigan_thz_tpu.train.schedules import (
    cosine_schedule,
    linear_schedule,
    make_schedule,
    step_schedule,
)
from pigan_thz_tpu.train.steps import StepSettings


def test_make_schedule_owns_dispatch_defaults():
    """make_schedule is the single kind->schedule dispatch: each kind
    reproduces the explicit builder with build_optimizer's defaults, so the
    megakernel's precomputed LR streams can't drift from optax's."""
    t = np.arange(0, 400, 37)
    pairs = [
        ("cosine", cosine_schedule(2e-4, 10, 31, 0.01)),
        ("step", step_schedule(2e-4, 10, 31, 0.5, 0.25)),
        ("linear", linear_schedule(2e-4, 10, 31)),
    ]
    for kind, explicit in pairs:
        got = make_schedule(kind, 2e-4, 10, 31)
        np.testing.assert_array_equal(
            np.asarray(got(t)), np.asarray(explicit(t)), err_msg=kind
        )
    assert float(make_schedule("constant", 3e-4, 10, 31)(123)) == 3e-4
    with pytest.raises(ValueError, match="unknown schedule"):
        make_schedule("plateau", 2e-4, 10, 31)


def test_backup_tag_rejects_canonical_collisions(cfg, small_ds, tmp_path):
    """backup_tag='ema' would clobber generator_ema (EMA params) with the
    LIVE params; reserved tags are rejected."""
    from pigan_thz_tpu.train import checkpoint as ckpt

    t = Trainer(cfg, ds=small_ds)
    t.init_pigan()
    for bad in ("final", "ema", "pretrained"):
        with pytest.raises(ValueError, match="canonical"):
            ckpt.save_final_trio(str(tmp_path), t.pigan_state, backup_tag=bad)
    ckpt.save_final_trio(str(tmp_path), t.pigan_state, backup_tag="emergency")
    assert ckpt.exists(str(tmp_path), "generator_emergency")


def test_gan_megakernel_oversized_epoch_routing(cfg, small_ds, monkeypatch):
    """A single epoch larger than _MAX_PROGRAM_GRID can't be clamped by the
    chunk cap (E=1 floor): default settings route to the chained
    sub-epoch driver (round 3c); settings outside its stochastic-stream
    envelope return None in auto and raise under force — never an
    unprobed program size."""
    import dataclasses as dc

    from pigan_thz_tpu.ops import megakernel as MK
    from pigan_thz_tpu.train import trainer as trainer_mod

    monkeypatch.setattr(trainer_mod.jax, "default_backend", lambda: "tpu")
    t = Trainer(cfg, ds=small_ds, megakernel="auto")
    t.steps_per_epoch = MK._MAX_PROGRAM_GRID + 1
    fn = t._maybe_megakernel(StepSettings.from_config(cfg), None)
    assert fn is not None and getattr(fn, "sub_epoch", False)
    # a stochastic-stream knob is outside the sub driver's envelope
    noisy = dc.replace(StepSettings.from_config(cfg), instance_noise=0.05)
    assert t._maybe_megakernel(noisy, None) is None
    tf = Trainer(cfg, ds=small_ds, megakernel="force")
    tf.steps_per_epoch = MK._MAX_PROGRAM_GRID + 1
    with pytest.raises(ValueError, match="whole-epoch rng chain"):
        tf._maybe_megakernel(noisy, None)


def test_gated_pad_policy_shared():
    """The GAN and forward gated plans use one padding policy
    (_best_pad_divisor): same cap+floor -> same (L, padded count)."""
    from pigan_thz_tpu.ops import megakernel as MK

    for n in (313, 499, 997):
        L, n_pad = MK._best_pad_divisor(n, 75, 8)
        assert n_pad >= n and n_pad % L == 0
        # forward plan with the same cap agrees
        orig = MK._FWD_MAX_TOTAL
        try:
            MK._FWD_MAX_TOTAL = 75
            assert MK._fwd_sub_plan(n) == (L, n_pad)
        finally:
            MK._FWD_MAX_TOTAL = orig


def test_saved_model_config_overlay(cfg, small_ds, tmp_path):
    """save_final persists the architecture sections; the CLI overlay
    rebuilds them for evaluate/screen/design/export, with explicit user
    --set model overrides still winning."""
    from types import SimpleNamespace

    from pigan_thz_tpu.cli import _overlay_saved_model_config
    from pigan_thz_tpu.train import checkpoint as ckpt

    c = cfg.replace(generator=dataclasses.replace(cfg.generator, name="residual"))
    t = Trainer(c, ds=small_ds)
    t.init_pigan()
    t.save_final(str(tmp_path))
    saved = ckpt.load_model_config(str(tmp_path))
    assert saved["generator"]["name"] == "residual"
    # default cfg + overlay -> matches the saved run
    args = SimpleNamespace(models=str(tmp_path), set=[])
    merged = _overlay_saved_model_config(cfg, args)
    assert merged.generator.name == "residual"
    assert merged.generator.hidden_dims == c.generator.hidden_dims
    # explicit user override beats the saved section
    args2 = SimpleNamespace(models=str(tmp_path), set=["generator.name=mlp"])
    assert _overlay_saved_model_config(cfg, args2).generator.name == "mlp"
    # absent file: unchanged
    args3 = SimpleNamespace(models=str(tmp_path / "nope"), set=[])
    assert _overlay_saved_model_config(cfg, args3).generator.name == "mlp"


def test_launch_plan_invariants_sweep():
    """Property sweep of the reliability-planning math: for every spe up to
    2000 and several epoch counts, the plan must keep each launch uniform,
    within caps, row-aligned, and cover exactly E*spe_pad grid steps."""
    from pigan_thz_tpu.ops import megakernel as MK

    cap = min(MK._MAX_GRID, MK._MAX_GRID_MULTI)
    for spe in range(1, 2001, 7):
        for E in (1, 2, 25):
            ls, n, rs, spe_pad = MK._launch_plan(E, spe)
            total = E * spe_pad
            assert ls * n == total, (spe, E)
            assert ls <= (MK._MAX_GRID if n == 1 else cap), (spe, E)
            assert ls % rs == 0 and spe_pad % rs == 0, (spe, E)
            assert 0 <= spe_pad - spe < spe, (spe, E)   # pad bounded
            if spe_pad != spe:
                # gated plans only when no usable divisor exists
                assert MK._largest_divisor(spe, cap) < MK._MIN_SUB_LAUNCH
            # launches never straddle an epoch boundary
            assert ls % spe_pad == 0 or spe_pad % ls == 0, (spe, E)

    for spe in range(1, 2001, 7):
        L, spe_pad = MK._fwd_sub_plan(spe)
        assert spe_pad % L == 0 and L <= MK._FWD_MAX_TOTAL
        assert 0 <= spe_pad - spe < spe
        if spe <= MK._FWD_MAX_TOTAL:
            assert (L, spe_pad) == (spe, spe)


def test_doctor_command(tmp_path, capsys):
    """`pigan doctor`: all checks green on a reachable (CPU) backend, JSON
    report written; the device probe runs in a killable subprocess."""
    import json as _json

    from pigan_thz_tpu.cli import main

    out = str(tmp_path / "doc.json")
    rc = main(["doctor", "--cpu", "--timeout", "120", "--json", out])
    checks = {c["check"]: c for c in _json.load(open(out))}
    assert rc == 0, checks
    assert checks["device"]["ok"] and "cpu" in checks["device"]["detail"]


def test_resume_warns_on_config_drift(cfg, small_ds, tmp_path, capsys):
    """Same-shape config drift (e.g. leaky_slope) restores cleanly but
    changes semantics: resume_from must surface the diff."""
    from pigan_thz_tpu.train import Trainer
    from pigan_thz_tpu.train import checkpoint as ckpt

    t = Trainer(cfg, ds=small_ds)
    t.init_pigan()
    mgr = ckpt.CheckpointManager(str(tmp_path), save_interval=1)
    mgr.save(1, t.pigan_state, config=cfg, history={"pigan/g_loss": [1.0]})
    drifted = cfg.replace(
        discriminator=dataclasses.replace(cfg.discriminator, leaky_slope=0.3)
    )
    t2 = Trainer(drifted, ds=small_ds)
    step = t2.resume_from(mgr)
    assert step == 1
    err = capsys.readouterr().err
    assert "discriminator config differs" in err and "leaky_slope" in err
    # no drift -> no warning
    t3 = Trainer(cfg, ds=small_ds)
    assert t3.resume_from(mgr) == 1
    assert "config differs" not in capsys.readouterr().err


def test_empty_tuple_override_roundtrip():
    """dict_to_overrides serializes an empty list as 'key=' — apply_overrides
    must parse that back to an empty tuple, not crash on int('')."""
    from pigan_thz_tpu.config import apply_overrides, default_config

    cfg = apply_overrides(default_config(), ["generator.hidden_dims="])
    assert cfg.generator.hidden_dims == ()
    cfg2 = apply_overrides(cfg, ["generator.hidden_dims=512,256"])
    assert cfg2.generator.hidden_dims == (512, 256)


def test_warmup_cosine_schedule_shape():
    """Round-5 scaled-batch recipe schedule: linear warmup over the first
    5% of steps to the peak LR, then cosine decay to alpha*lr."""
    import numpy as np

    lr, epochs, spe = 1.6e-3, 100, 15
    sched = make_schedule("warmup_cosine", lr, epochs, spe)
    total = epochs * spe
    warm = max(1, int(0.05 * total))
    assert float(sched(0)) < 0.2 * lr                  # starts near zero
    assert float(sched(warm)) == pytest.approx(lr, rel=1e-5)   # peak
    vals = np.array([float(sched(t)) for t in range(warm, total, 50)])
    assert (np.diff(vals) <= 1e-12).all()              # monotone decay
    assert float(sched(total)) == pytest.approx(lr * 0.01, rel=0.05)


def test_model_config_carries_data_bounds(tmp_path):
    """round 5: model_config.json records the artifact-semantics data
    fields so export/evaluate rebuild the exact de/normalization bounds
    (a cfg drift at export time would silently mis-scale physical
    parameters)."""
    import dataclasses

    from pigan_thz_tpu import default_config
    from pigan_thz_tpu.cli import _overlay_model_config_dir
    from pigan_thz_tpu.train import checkpoint as ckpt

    trained = default_config()
    trained = trained.replace(
        data=dataclasses.replace(trained.data, param_min=1.5, param_max=3.5)
    )
    ckpt.save_model_config(str(tmp_path), trained)
    # a consumer with DEFAULT config adopts the saved bounds
    merged = _overlay_model_config_dir(default_config(), str(tmp_path), [])
    assert merged.data.param_min == pytest.approx(1.5)
    assert merged.data.param_max == pytest.approx(3.5)
    # explicit user --set for a data field still wins
    merged2 = _overlay_model_config_dir(
        default_config(), str(tmp_path), ["data.param_max=2.9"]
    )
    assert merged2.data.param_max == pytest.approx(2.9)
