"""Augmentation + WGAN-GP + instance-noise step tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu.data import gather_batch
from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.ops.augment import augment_spectra
from pigan_thz_tpu.train import (
    StepSettings,
    init_pigan_state,
    make_optimizers,
    make_pigan_step,
)

pytestmark = pytest.mark.slow  # end-to-end training tier


def test_augment_shapes_and_clamp():
    k = jax.random.PRNGKey(0)
    spectra = -jnp.abs(jax.random.normal(k, (16, 250)))
    out = augment_spectra(k, spectra, noise_level=0.05, freq_shift=0.02, amp_scale=0.1)
    assert out.shape == spectra.shape
    assert float(out.max()) <= 0.0
    assert float(jnp.mean(jnp.abs(out - spectra))) > 0.0


def test_augment_disabled_is_identity():
    k = jax.random.PRNGKey(0)
    spectra = -jnp.abs(jax.random.normal(k, (4, 50)))
    out = augment_spectra(k, spectra, noise_level=0.0, freq_shift=0.0, amp_scale=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(spectra))


def test_augment_shift_rolls():
    spectra = jnp.tile(jnp.arange(-50.0, 0.0)[None, :], (8, 1))
    out = augment_spectra(jax.random.PRNGKey(1), spectra, noise_level=0.0,
                          freq_shift=0.1, amp_scale=0.0)
    # every row is a circular roll of the input: same multiset of values
    np.testing.assert_allclose(
        np.sort(np.asarray(out), axis=1), np.sort(np.asarray(spectra), axis=1),
        rtol=1e-6,
    )


@pytest.fixture(scope="module")
def sys_(cfg, small_ds):
    g, d, f = build_trio(cfg)
    g_tx, d_tx, f_tx = make_optimizers(cfg, 4)
    batch = gather_batch(small_ds, jnp.arange(cfg.train.batch_size))
    return g, d, f, g_tx, d_tx, batch, small_ds


def _run_one(sys_, settings):
    g, d, f, g_tx, d_tx, batch, ds = sys_
    ps = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(0))
    step = jax.jit(make_pigan_step(g, d, f, g_tx, d_tx, settings,
                                   ds.param_lo, ds.param_hi))
    ps, m = step(ps, batch, 1.0)
    return ps, {k: float(v) for k, v in m.items()}


def test_wgan_gp_step_runs(sys_):
    ps, m = _run_one(sys_, StepSettings(gan_loss="wgan_gp", gp_weight=10.0))
    for k, v in m.items():
        assert np.isfinite(v), k


def test_wgan_gp_differs_from_bce(sys_):
    _, m_bce = _run_one(sys_, StepSettings())
    _, m_w = _run_one(sys_, StepSettings(gan_loss="wgan_gp"))
    assert m_bce["d_loss"] != m_w["d_loss"]


def test_instance_noise_and_augment_in_step(sys_):
    ps, m = _run_one(sys_, StepSettings(
        instance_noise=0.05, augment_noise=0.05, augment_shift=0.02,
        augment_scale=0.1,
    ))
    for k, v in m.items():
        assert np.isfinite(v), k
