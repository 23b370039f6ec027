"""Ensemble λ-sweep and inverse-design screening tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu.design import METRIC_INDEX, ScreeningConfig, screen_designs
from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.parallel.ensemble import (
    EnsembleSettings,
    init_ensemble_states,
    make_ensemble_epoch_fn,
    make_ensemble_pigan_step,
    weight_vector,
)
from pigan_thz_tpu.train import make_optimizers


@pytest.fixture(scope="module")
def trio(cfg):
    g, d, f = build_trio(cfg)
    g_tx, d_tx, f_tx = make_optimizers(cfg, 4)
    return g, d, f, g_tx, d_tx, f_tx


@pytest.mark.slow
def test_ensemble_members_diverge_with_weights(trio, small_ds, cfg):
    """Same data, same seeds-per-member, different λ -> different params."""
    g, d, f, g_tx, d_tx, _ = trio
    n = 3
    states = init_ensemble_states(
        g, d, f, g_tx, d_tx, n, jax.random.PRNGKey(0)
    )
    weights = jnp.stack(
        [weight_vector(recon=1.0), weight_vector(recon=100.0), weight_vector(recon=100.0)]
    )
    step = make_ensemble_pigan_step(
        g, d, f, g_tx, d_tx, EnsembleSettings(), small_ds.param_lo, small_ds.param_hi
    )
    epoch = make_ensemble_epoch_fn(step, cfg.train.batch_size)
    states, m = epoch(states, small_ds, jax.random.PRNGKey(1), weights)
    assert m["g_loss"].shape == (n,)
    assert all(np.isfinite(v) for v in np.asarray(m["g_loss"]))
    # member 1 vs 2 share λ but different init seeds -> both trained;
    # member 0 vs 1 differ in λ -> losses must differ
    assert float(m["g_loss"][0]) != float(m["g_loss"][1])


@pytest.mark.slow
def test_ensemble_step_counts(trio, small_ds, cfg):
    g, d, f, g_tx, d_tx, _ = trio
    states = init_ensemble_states(g, d, f, g_tx, d_tx, 2, jax.random.PRNGKey(0))
    weights = jnp.stack([weight_vector(), weight_vector()])
    step = make_ensemble_pigan_step(
        g, d, f, g_tx, d_tx, EnsembleSettings(), small_ds.param_lo, small_ds.param_hi
    )
    epoch = make_ensemble_epoch_fn(step, cfg.train.batch_size)
    states, _ = epoch(states, small_ds, jax.random.PRNGKey(1), weights)
    steps = small_ds.num_samples // cfg.train.batch_size
    np.testing.assert_array_equal(np.asarray(states.step), steps)


@pytest.mark.slow
def test_runtime_weights_match_static_step(trio, small_ds):
    """make_pigan_step(runtime_weights=True) with the default weight vector
    must produce bit-identical updates to the compile-time-weights step —
    the ensemble path is the SAME implementation, not a drifting copy."""
    from pigan_thz_tpu.data.dataset import gather_batch
    from pigan_thz_tpu.train import init_pigan_state
    from pigan_thz_tpu.train.steps import StepSettings, make_pigan_step

    g, d, f, g_tx, d_tx, _ = trio
    state = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(3))
    batch = gather_batch(small_ds, jnp.arange(16))

    static_step = make_pigan_step(
        g, d, f, g_tx, d_tx, StepSettings(),
        small_ds.param_lo, small_ds.param_hi,
    )
    dyn_step = make_pigan_step(
        g, d, f, g_tx, d_tx, StepSettings(),
        small_ds.param_lo, small_ds.param_hi, runtime_weights=True,
    )
    s1, m1 = jax.jit(static_step)(state, batch)
    s2, m2 = jax.jit(dyn_step)(state, batch, weight_vector())
    jax.tree.map(np.testing.assert_array_equal, s1.g.params, s2.g.params)
    jax.tree.map(np.testing.assert_array_equal, s1.d.params, s2.d.params)
    np.testing.assert_allclose(float(m1["g_loss"]), float(m2["g_loss"]), rtol=1e-6)


def test_screening_returns_sorted_topk(trio, small_ds):
    g, d, f, g_tx, d_tx, _ = trio
    fv = f.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((2, 4)), train=False,
    )
    sc = ScreeningConfig(num_candidates=4096, chunk_size=1024, top_k=16, objective="FoM1")
    res = screen_designs(
        f, fv, small_ds.frequencies, small_ds.param_lo, small_ds.param_hi,
        jax.random.PRNGKey(1), sc,
    )
    scores = np.asarray(res.scores)
    assert res.params.shape == (16, 4)
    assert res.metrics.shape == (16, 8)
    # descending order
    assert all(scores[i] >= scores[i + 1] for i in range(len(scores) - 1))
    # params mapped back to physical units within the design box
    p = np.asarray(res.params)
    assert p.min() >= float(small_ds.param_lo.min()) - 1e-5
    assert p.max() <= float(small_ds.param_hi.max()) + 1e-5


def test_screening_objective_consistency(trio, small_ds):
    """Winner scores must equal the named metric column (when finite)."""
    g, d, f, g_tx, d_tx, _ = trio
    fv = f.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((2, 4)), train=False,
    )
    sc = ScreeningConfig(num_candidates=2048, chunk_size=1024, top_k=8, objective="Q1")
    res = screen_designs(
        f, fv, small_ds.frequencies, small_ds.param_lo, small_ds.param_hi,
        jax.random.PRNGKey(2), sc,
    )
    scores = np.asarray(res.scores)
    col = np.asarray(res.metrics)[:, METRIC_INDEX["Q1"]]
    finite = np.isfinite(scores)
    np.testing.assert_allclose(scores[finite], col[finite], rtol=1e-6)


@pytest.mark.slow
def test_ensemble_multi_epoch_fn(trio, small_ds, cfg):
    """E ensemble epochs in one jit call: per-epoch metrics stacked, step
    counts advanced E*steps_per_epoch."""
    from pigan_thz_tpu.parallel.ensemble import make_ensemble_multi_epoch_fn

    g, d, f, g_tx, d_tx, _ = trio
    n, e = 2, 3
    states = init_ensemble_states(g, d, f, g_tx, d_tx, n, jax.random.PRNGKey(0))
    weights = jnp.stack([weight_vector()] * n)
    step = make_ensemble_pigan_step(
        g, d, f, g_tx, d_tx, EnsembleSettings(),
        small_ds.param_lo, small_ds.param_hi,
    )
    multi = make_ensemble_multi_epoch_fn(step, cfg.train.batch_size)
    states, ms = multi(states, small_ds, jax.random.PRNGKey(1), weights, e)
    assert ms["g_loss"].shape == (e, n)
    assert np.isfinite(np.asarray(ms["g_loss"])).all()
    spe = small_ds.num_samples // cfg.train.batch_size
    np.testing.assert_array_equal(np.asarray(states.step), e * spe)


@pytest.mark.slow
def test_evaluate_ensemble_mean(trio, small_ds, cfg):
    """Ensemble-mean scoring: keys present, finite, spread >= 0; mean of
    identical members must equal any single member's prediction score."""
    from pigan_thz_tpu.parallel.ensemble import (
        evaluate_ensemble,
        evaluate_ensemble_mean,
    )

    g, d, f, g_tx, d_tx, _ = trio
    # two members with THE SAME seed -> identical params -> zero spread
    s1 = init_ensemble_states(g, d, f, g_tx, d_tx, 1, jax.random.PRNGKey(0))
    same = jax.tree.map(lambda x: jnp.concatenate([x, x], axis=0), s1)
    res = evaluate_ensemble_mean(g, f, same, small_ds)
    assert float(res["member_spread"]) == 0.0
    single = evaluate_ensemble(g, f, s1, small_ds)
    np.testing.assert_allclose(float(res["param_r2"]),
                               float(single["param_r2"][0]), rtol=1e-5)

    diverse = init_ensemble_states(g, d, f, g_tx, d_tx, 3, jax.random.PRNGKey(1))
    res = evaluate_ensemble_mean(g, f, diverse, small_ds)
    assert float(res["member_spread"]) > 0.0
    for k, v in res.items():
        assert np.isfinite(float(v)), k


def test_screening_masks_ceil_divide_padding(trio, small_ds):
    """num_candidates not divisible by chunk_size: the final chunk's extra
    rows are padding, not free screening (review r4).  With top_k >
    num_candidates the padding surfaces as valid=False filler rows and
    exactly num_candidates rows are valid."""
    g, d, f, g_tx, d_tx, _ = trio
    fv = f.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((2, 4)), train=False,
    )
    sc = ScreeningConfig(num_candidates=10, chunk_size=16, top_k=12,
                         objective="FoM1", min_prominence=0.0)
    res = screen_designs(
        f, fv, small_ds.frequencies, small_ds.param_lo, small_ds.param_hi,
        jax.random.PRNGKey(3), sc,
    )
    valid = np.asarray(res.valid)
    scores = np.asarray(res.scores)
    assert valid.sum() <= 10                      # never more than asked
    assert (scores[~valid] == -np.inf).all()      # filler is marked
    # identical candidates with a matching 10/10 config: the masked run's
    # valid winners must be a prefix-equal subset (same key, same chunks)
    sc2 = ScreeningConfig(num_candidates=10, chunk_size=16, top_k=10,
                          objective="FoM1", min_prominence=0.0)
    res2 = screen_designs(
        f, fv, small_ds.frequencies, small_ds.param_lo, small_ds.param_hi,
        jax.random.PRNGKey(3), sc2,
    )
    n = int(valid.sum())
    np.testing.assert_array_equal(
        np.asarray(res.scores)[:n], np.asarray(res2.scores)[:n]
    )


def test_screening_bf16_surrogate(trio, small_ds):
    """compute_dtype='bfloat16' (the serving fast path's dtype) screens to
    a valid, sorted top-k whose scores approximate the fp32 run's; the
    pallas+bf16 combination refuses."""
    g, d, f, g_tx, d_tx, _ = trio
    fv = f.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((2, 4)), train=False,
    )
    kw = dict(num_candidates=2048, chunk_size=1024, top_k=8, objective="FoM1")
    res32 = screen_designs(
        f, fv, small_ds.frequencies, small_ds.param_lo, small_ds.param_hi,
        jax.random.PRNGKey(3), ScreeningConfig(**kw),
    )
    res16 = screen_designs(
        f, fv, small_ds.frequencies, small_ds.param_lo, small_ds.param_hi,
        jax.random.PRNGKey(3), ScreeningConfig(compute_dtype="bfloat16", **kw),
    )
    s32, s16 = np.asarray(res32.scores), np.asarray(res16.scores)
    assert all(s16[i] >= s16[i + 1] for i in range(len(s16) - 1))
    finite = np.isfinite(s32) & np.isfinite(s16)
    if finite.any():
        np.testing.assert_allclose(s16[finite], s32[finite], rtol=0.1)
    with pytest.raises(ValueError, match="float32 only"):
        screen_designs(
            f, fv, small_ds.frequencies, small_ds.param_lo,
            small_ds.param_hi, jax.random.PRNGKey(3),
            ScreeningConfig(compute_dtype="bfloat16", use_pallas=True, **kw),
        )
    with pytest.raises(ValueError, match="compute_dtype"):
        screen_designs(
            f, fv, small_ds.frequencies, small_ds.param_lo,
            small_ds.param_hi, jax.random.PRNGKey(3),
            ScreeningConfig(compute_dtype="float16", **kw),
        )
