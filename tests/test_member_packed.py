"""Member-packed ensemble megakernel (make_pallas_ensemble_fn), interpret
mode.  The contract: member m trained inside the M-member packed launch is
BIT-IDENTICAL to training it alone through make_pallas_multi_epoch_fn with
key = fold_in(key, m) — the packing adds a member axis and ref views,
never numerics."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.ops.megakernel import (
    make_pallas_ensemble_fn,
    make_pallas_multi_epoch_fn,
)
from pigan_thz_tpu.train import (
    StepSettings,
    init_pigan_state,
    make_optimizers,
)


def _fresh_states(cfg, small_ds, n, key):
    """n seed-ensemble member states SHARING one frozen F (the packed
    kernel takes member 0's F; real seed ensembles share the pretrained
    surrogate the same way — parallel/ensemble_megakernel.py)."""
    g, d, f = build_trio(cfg)
    spe = small_ds.num_samples // cfg.train.batch_size
    g_tx, d_tx, _ = make_optimizers(cfg, spe)
    shared_f = init_pigan_state(
        g, d, f, g_tx, d_tx, jax.random.fold_in(key, 0),
        spectrum_dim=cfg.data.spectrum_dim, param_dim=cfg.data.param_dim,
    ).f.variables
    return [
        init_pigan_state(
            g, d, f, g_tx, d_tx, jax.random.fold_in(key, m),
            spectrum_dim=cfg.data.spectrum_dim,
            param_dim=cfg.data.param_dim,
            forward_variables=shared_f,
        )
        for m in range(n)
    ]


@pytest.mark.slow
def test_packed_members_bitwise_match_solo(cfg, small_ds):
    key = jax.random.PRNGKey(11)
    k_init, k_train = jax.random.split(key)
    M, E = 2, 2
    states = _fresh_states(cfg, small_ds, M, k_init)
    settings = StepSettings.from_config(cfg)
    ens = make_pallas_ensemble_fn(cfg, settings, M, interpret=True)
    ones = jnp.ones((E,), jnp.float32)
    out_states, out_metrics = ens(states, small_ds, k_train, ones)

    assert len(out_states) == M and len(out_metrics) == M
    for mm in out_metrics:
        assert mm["g_loss"].shape == (E,)
        assert all(np.isfinite(np.asarray(v)).all() for v in mm.values())
    # members actually trained independently
    assert not np.array_equal(
        np.asarray(out_metrics[0]["g_loss"]), np.asarray(out_metrics[1]["g_loss"])
    )

    # solo replays: same init seed, same fold_in(key, m) stream key
    solo_fn = make_pallas_multi_epoch_fn(cfg, settings, interpret=True)
    solo_states = _fresh_states(cfg, small_ds, M, k_init)
    for m in range(M):
        st, mets = solo_fn(
            solo_states[m], small_ds, jax.random.fold_in(k_train, m), ones
        )
        for k in mets:
            np.testing.assert_array_equal(
                np.asarray(mets[k]), np.asarray(out_metrics[m][k]),
                err_msg=f"member {m} metric {k}",
            )
        for pa, pb in zip(
            jax.tree.leaves(st.g.variables),
            jax.tree.leaves(out_states[m].g.variables),
        ):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
        for pa, pb in zip(
            jax.tree.leaves(st.d.params),
            jax.tree.leaves(out_states[m].d.params),
        ):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
        # optimizer moments + counts too (full-state contract)
        for pa, pb in zip(
            jax.tree.leaves(st.g_opt), jax.tree.leaves(out_states[m].g_opt)
        ):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))


def test_ensemble_fn_validation(cfg, small_ds):
    settings = StepSettings.from_config(cfg)
    with pytest.raises(ValueError, match="num_members"):
        make_pallas_ensemble_fn(cfg, settings, 0, interpret=True)
    with pytest.raises(ValueError, match="ema_decay"):
        make_pallas_ensemble_fn(
            cfg, dataclasses.replace(settings, ema_decay=0.99), 2,
            interpret=True,
        )
    ens = make_pallas_ensemble_fn(cfg, settings, 2, interpret=True)
    states = _fresh_states(cfg, small_ds, 1, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="expected 2 states"):
        ens(states, small_ds, jax.random.PRNGKey(1), jnp.ones((1,), jnp.float32))


def test_ensemble_fn_refuses_large_member_groups(cfg):
    """M > 4 in one launch measured a 25+ minute Mosaic compile (RESULTS.md
    'Member-packed kernel') — refuse with the reason unless forced
    (VERDICT r4 #4).  interpret=True is exempt (no Mosaic compile)."""
    settings = StepSettings.from_config(cfg)
    with pytest.raises(ValueError, match="compile envelope"):
        make_pallas_ensemble_fn(cfg, settings, 8)
    # forcing (or interpret mode) builds the fn without complaint
    make_pallas_ensemble_fn(cfg, settings, 8, force_large_m=True)
    make_pallas_ensemble_fn(cfg, settings, 8, interpret=True)


def test_ensemble_fn_rejects_mismatched_frozen_f(cfg, small_ds):
    """The packed launch carries ONE frozen F (member 0's) — members built
    from different forward_variables must be refused (review r4 advice)."""
    settings = StepSettings.from_config(cfg)
    ens = make_pallas_ensemble_fn(cfg, settings, 2, interpret=True)
    ones = jnp.ones((1,), jnp.float32)
    s0, s1 = _fresh_states(cfg, small_ds, 2, jax.random.PRNGKey(0))
    # member 1 gets its own (different) F
    own_f = init_pigan_state(
        *build_trio(cfg),
        *make_optimizers(cfg, small_ds.num_samples // cfg.train.batch_size)[:2],
        jax.random.PRNGKey(77),
        spectrum_dim=cfg.data.spectrum_dim, param_dim=cfg.data.param_dim,
    ).f
    s1 = dataclasses.replace(s1, f=own_f)
    with pytest.raises(ValueError, match="frozen F"):
        ens([s0, s1], small_ds, jax.random.PRNGKey(1), ones)


def test_ensemble_fn_rejects_mismatched_member_positions(cfg, small_ds):
    """Packed members share ONE schedule/bias-correction stream built from
    member 0's counters — a member at a different training position must be
    refused, not silently mis-trained (review r4)."""
    settings = StepSettings.from_config(cfg)
    ens = make_pallas_ensemble_fn(cfg, settings, 2, interpret=True)
    ones = jnp.ones((1,), jnp.float32)
    s0, s1 = _fresh_states(cfg, small_ds, 2, jax.random.PRNGKey(0))
    # advance member 1 by one epoch through the solo kernel
    solo = make_pallas_multi_epoch_fn(cfg, settings, interpret=True)
    s1, _ = solo(s1, small_ds, jax.random.PRNGKey(9), ones)
    with pytest.raises(ValueError, match="training position"):
        ens([s0, s1], small_ds, jax.random.PRNGKey(1), ones)
