"""Shadow-parity net: the megakernel's finite-but-wrong corruption guard.

Round 3d found a miscompile class the non-finite fallback net cannot see:
the forward megakernel trained a numerically FINITE but wrong surrogate
(first-chunk loss ~10x the XLA value) and poisoned everything downstream.
``Trainer(shadow_parity="first")`` (the default) replays the first
megakernel chunk of each kind on the XLA path from the same pre-chunk
state and rng, and compares the first epoch's metric row; a mismatch is a
fallback trip and the run continues from the XLA replay's state.

These tests drive the net in interpret mode on CPU, where the kernel and
the XLA path agree to ~1e-6 (test_megakernel.py parity suite), far inside
the trip tolerance — so a clean kernel passes and a poisoned one trips.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pigan_thz_tpu.data import synthetic_dataset
from pigan_thz_tpu.train import ForwardStepSettings, Trainer
from pigan_thz_tpu.train import trainer as trainer_mod


def _small(cfg, n=128):
    return cfg.replace(data=dataclasses.replace(cfg.data, num_samples=n))


def test_shadow_parity_clean_gan(cfg):
    cfg = _small(cfg)
    ds = synthetic_dataset(cfg.data)
    t = Trainer(cfg, ds=ds, epochs_per_call=2, megakernel="force")
    t.init_pigan()
    t.train_pigan(epochs=4, log_every=10**9)
    assert t.fallback_trips == 0
    # exactly one replay (first chunk only), recorded and passing
    assert [c["what"] for c in t.shadow_checks] == ["pigan"]
    assert t.shadow_checks[0]["ok"]
    assert t.shadow_checks[0]["worst_rel"] < 1e-3  # interpret-mode parity
    assert len(t.train_history["pigan/g_loss"]) == 4


def test_shadow_parity_clean_forward(cfg):
    cfg = _small(cfg)
    # interpret mode refuses in-kernel dropout (hardware PRNG only)
    cfg = cfg.replace(
        forward_model=dataclasses.replace(cfg.forward_model, dropout_rate=0.0)
    )
    ds = synthetic_dataset(cfg.data)
    t = Trainer(cfg, ds=ds, epochs_per_call=2, megakernel="force")
    t.pretrain_forward(epochs=2, settings=ForwardStepSettings(), log_every=10**9)
    assert t.fallback_trips == 0
    assert [c["what"] for c in t.shadow_checks] == ["forward"]
    assert t.shadow_checks[0]["ok"]


def test_shadow_parity_off(cfg):
    cfg = _small(cfg)
    ds = synthetic_dataset(cfg.data)
    t = Trainer(
        cfg, ds=ds, epochs_per_call=2, megakernel="force", shadow_parity="off"
    )
    t.init_pigan()
    t.train_pigan(epochs=2, log_every=10**9)
    assert t.shadow_checks == []
    assert t.fallback_trips == 0


def test_shadow_parity_all_mode(cfg):
    cfg = _small(cfg)
    ds = synthetic_dataset(cfg.data)
    t = Trainer(
        cfg, ds=ds, epochs_per_call=2, megakernel="force", shadow_parity="all"
    )
    t.init_pigan()
    t.train_pigan(epochs=4, log_every=10**9)  # two chunks -> two replays
    assert [c["what"] for c in t.shadow_checks] == ["pigan", "pigan"]
    assert all(c["ok"] for c in t.shadow_checks)
    assert t.fallback_trips == 0


def test_shadow_trip_on_finite_but_wrong_kernel(cfg, monkeypatch, capsys):
    """A kernel returning FINITE but wrong metrics (the round-3d class) must
    trip the shadow net: the run continues from the XLA replay's state with
    the megakernel disabled, and the recorded history carries the XLA
    values, not the corrupted ones."""
    cfg = _small(cfg)
    ds = synthetic_dataset(cfg.data)
    t = Trainer(cfg, ds=ds, epochs_per_call=2, megakernel="force")

    real_factory = Trainer._maybe_megakernel
    calls = {"n": 0}

    def corrupting(self, settings, override_key):
        real = real_factory(self, settings, override_key)
        if real is None:  # preserve the XLA-path contract (t2 below)
            return None

        def fn(state, ds_, key, scales):
            calls["n"] += 1
            new_state, ms = real(state, ds_, key, scales)
            # finite-but-wrong: every metric 10x off, state subtly scaled
            bad_state = jax.tree.map(
                lambda x: x * 1.5 if jnp.issubdtype(x.dtype, jnp.floating) else x,
                new_state,
            )
            return bad_state, {k: v * 10.0 for k, v in ms.items()}

        return fn

    monkeypatch.setattr(Trainer, "_maybe_megakernel", corrupting)
    t.init_pigan()
    t.train_pigan(epochs=4, log_every=10**9)
    assert calls["n"] == 1  # corrupted chunk ran once, then XLA took over
    assert t.fallback_trips == 1
    assert t.fallback_events == ["pigan-shadow@epoch0"]
    assert not t.shadow_checks[0]["ok"]
    assert "shadow" in capsys.readouterr().err

    # history must be the XLA replay's numbers: rerun on a clean XLA-only
    # trainer with the same seeds and compare the first chunk's rows
    t2 = Trainer(cfg, ds=ds, epochs_per_call=2, megakernel="off")
    t2.init_pigan()
    t2.train_pigan(epochs=4, log_every=10**9)
    for k in ("pigan/g_loss", "pigan/d_loss"):
        np.testing.assert_allclose(
            t.train_history[k], t2.train_history[k], rtol=1e-4, atol=1e-6
        )


def test_shadow_tolerance_constants():
    # the trip thresholds must stay an order of magnitude above measured
    # clean-hardware divergence (~1e-3 rel) and well under the round-3d
    # corruption signature (~10x)
    assert 0.01 <= trainer_mod._SHADOW_RTOL <= 0.9
    assert trainer_mod._SHADOW_RTOL_DROPOUT >= trainer_mod._SHADOW_RTOL


def test_shadow_every_n_cadence(cfg):
    """every:N replays chunk 0 and every Nth after, per kind."""
    cfg = _small(cfg)
    ds = synthetic_dataset(cfg.data)
    t = Trainer(
        cfg, ds=ds, epochs_per_call=1, megakernel="force",
        shadow_parity="every:2",
    )
    t.init_pigan()
    t.train_pigan(epochs=5, log_every=10**9)  # chunks 0..4 -> replays 0,2,4
    assert [c["at"] for c in t.shadow_checks] == [0, 2, 4]
    assert all(c["ok"] for c in t.shadow_checks)
    assert t.fallback_trips == 0


def test_shadow_every_n_trips_midrun(cfg, monkeypatch):
    """VERDICT r3 #2: corruption appearing AFTER the first chunk (the
    blind spot of shadow_parity='first') must trip the periodic net at a
    later replay, and the run must continue finite on XLA."""
    cfg = _small(cfg)
    ds = synthetic_dataset(cfg.data)
    t = Trainer(
        cfg, ds=ds, epochs_per_call=1, megakernel="force",
        shadow_parity="every:2",
    )
    real_factory = Trainer._maybe_megakernel
    calls = {"n": 0}

    def late_corrupting(self, settings, override_key):
        real = real_factory(self, settings, override_key)
        if real is None:
            return None

        def fn(state, ds_, key, scales):
            calls["n"] += 1
            new_state, ms = real(state, ds_, key, scales)
            if calls["n"] >= 3:   # clean chunks 0-1, corrupt from chunk 2
                return new_state, {k: v * 10.0 for k, v in ms.items()}
            return new_state, ms

        return fn

    monkeypatch.setattr(Trainer, "_maybe_megakernel", late_corrupting)
    t.init_pigan()
    t.train_pigan(epochs=6, log_every=10**9)
    # replay at chunk 0 passes; replay at chunk 2 sees the corruption
    assert t.fallback_trips == 1
    assert t.fallback_events == ["pigan-shadow@epoch2"]
    assert [c["ok"] for c in t.shadow_checks] == [True, False]
    assert len(t.train_history["pigan/g_loss"]) == 6
    assert np.isfinite(t.train_history["pigan/g_loss"]).all()


def test_shadow_every_n_validation(cfg):
    import pytest

    cfg = _small(cfg)
    ds = synthetic_dataset(cfg.data)
    with pytest.raises(ValueError, match="N >= 1"):
        Trainer(cfg, ds=ds, shadow_parity="every:0")


def test_shadow_trip_on_nan_replay(cfg, monkeypatch):
    """An XLA replay row that diverges to NaN must FAIL shadow parity.
    Review r4: 'NaN > threshold' is False, so the net previously logged a
    clean pass on the loudest possible kernel-vs-XLA mismatch."""
    cfg = _small(cfg)
    ds = synthetic_dataset(cfg.data)
    t = Trainer(cfg, ds=ds, epochs_per_call=2, megakernel="force")
    real_make = Trainer._make_multi_epoch
    calls = {"n": 0}

    def nan_first_xla(self, *a, **k):
        real = real_make(self, *a, **k)

        def fn(state, ds_, key, scales):
            new_state, ms = real(state, ds_, key, scales)
            calls["n"] += 1
            if calls["n"] == 1:  # the shadow replay of chunk 0
                ms = {k2: v * jnp.nan for k2, v in ms.items()}
            return new_state, ms

        return fn

    monkeypatch.setattr(Trainer, "_make_multi_epoch", nan_first_xla)
    t.init_pigan()
    t.train_pigan(epochs=4, log_every=10**9)
    assert calls["n"] >= 2  # replay + recompute/continuation
    assert t.fallback_trips == 1
    assert t.fallback_events == ["pigan-shadow@epoch0"]
    assert not t.shadow_checks[0]["ok"]
    # the recorded history is the clean recompute, not NaN
    assert all(np.isfinite(t.train_history["pigan/g_loss"]))
