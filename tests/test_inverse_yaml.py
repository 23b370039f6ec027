"""InverseDesigner, ensemble evaluation, and YAML config tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu import default_config
from pigan_thz_tpu.config import from_yaml, to_yaml
from pigan_thz_tpu.design import InverseDesigner
from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.parallel.ensemble import (
    EnsembleSettings,
    evaluate_ensemble,
    init_ensemble_states,
    make_ensemble_epoch_fn,
    make_ensemble_pigan_step,
    weight_vector,
)
from pigan_thz_tpu.train import (
    Trainer,
    make_optimizers,
)

pytestmark = pytest.mark.slow  # end-to-end training tier


@pytest.fixture(scope="module")
def trained(cfg, small_ds):
    t = Trainer(cfg, ds=small_ds, epochs_per_call=10)
    t.pretrain_forward(epochs=20, log_every=100)
    t.init_pigan()
    t.train_pigan(epochs=4, log_every=100)
    return t


def test_inverse_designer_basic(trained, small_ds):
    st = trained.pigan_state
    designer = InverseDesigner(
        trained.generator, trained.forward_model, st.g.variables, st.f.variables,
        small_ds,
    )
    out = designer.design(small_ds.spectra[:8])
    assert out.params.shape == (8, 4)
    assert out.pred_spectrum.shape == (8, small_ds.spectrum_dim)
    assert bool(jnp.all(jnp.isfinite(out.spectrum_mse)))
    # physical units inside the design box
    assert float(out.params.min()) >= float(small_ds.param_lo.min()) - 1e-4
    assert float(out.params.max()) <= float(small_ds.param_hi.max()) + 1e-4


def test_refinement_improves_match(trained, small_ds):
    """Gradient refinement through the frozen surrogate must not worsen the
    surrogate-spectrum match, and typically improves it substantially."""
    st = trained.pigan_state
    designer = InverseDesigner(
        trained.generator, trained.forward_model, st.g.variables, st.f.variables,
        small_ds,
    )
    spectra = small_ds.spectra[:16]
    base = designer.design(spectra)
    refined = designer.design(spectra, refine_steps=100)
    assert float(refined.spectrum_mse.mean()) <= float(base.spectrum_mse.mean())
    # refined params stay in the normalized domain
    assert float(jnp.max(jnp.abs(refined.params_norm))) <= 1.0


def test_single_spectrum_interface(trained, small_ds):
    st = trained.pigan_state
    designer = InverseDesigner(
        trained.generator, trained.forward_model, st.g.variables, st.f.variables,
        small_ds,
    )
    out = designer.design(small_ds.spectra[0])
    assert out.params.shape == (4,)
    s_mean, s_std, m_mean, m_std = designer.uncertainty(
        small_ds.spectra[0], jax.random.PRNGKey(0), num_samples=8
    )
    assert s_mean.shape == (1, small_ds.spectrum_dim)
    assert float(s_std.mean()) > 0.0


def test_ensemble_evaluation(cfg, small_ds):
    g, d, f = build_trio(cfg)
    g_tx, d_tx, _ = make_optimizers(cfg, 4)
    states = init_ensemble_states(g, d, f, g_tx, d_tx, 3, jax.random.PRNGKey(0))
    weights = jnp.stack([weight_vector(recon=r) for r in (1.0, 50.0, 200.0)])
    step = make_ensemble_pigan_step(g, d, f, g_tx, d_tx, EnsembleSettings(),
                                    small_ds.param_lo, small_ds.param_hi)
    epoch = make_ensemble_epoch_fn(step, cfg.train.batch_size)
    states, _ = epoch(states, small_ds, jax.random.PRNGKey(1), weights)
    ev = evaluate_ensemble(g, f, states, small_ds)
    assert ev["param_r2"].shape == (3,)
    assert ev["recon_mse"].shape == (3,)
    assert all(np.isfinite(v) for v in np.asarray(ev["param_r2"]))


def test_yaml_roundtrip(tmp_path):
    cfg = default_config()
    path = str(tmp_path / "cfg.yaml")
    to_yaml(cfg, path)
    cfg2 = from_yaml(path)
    assert cfg2 == cfg


def test_yaml_partial_overlay(tmp_path):
    path = str(tmp_path / "part.yaml")
    with open(path, "w") as fh:
        fh.write("train:\n  num_epochs: 42\ngenerator:\n  name: residual\n")
    cfg = from_yaml(path)
    assert cfg.train.num_epochs == 42
    assert cfg.generator.name == "residual"
    assert cfg.train.batch_size == 64  # untouched default


def test_yaml_unknown_key_errors(tmp_path):
    path = str(tmp_path / "bad.yaml")
    with open(path, "w") as fh:
        fh.write("train:\n  bogus: 1\n")
    with pytest.raises(KeyError):
        from_yaml(path)


def test_uncertainty_at_refined_design_point(trained, small_ds):
    """`uncertainty(params_norm=...)` evaluates the MC-dropout spread AT the
    refined design, not the raw generator prediction the row no longer
    reports (cli design --uncertainty regression)."""
    st = trained.pigan_state
    designer = InverseDesigner(
        trained.generator, trained.forward_model, st.g.variables, st.f.variables,
        small_ds,
    )
    spectra = small_ds.spectra[:4]
    refined = designer.design(spectra, refine_steps=50)
    s_mean, s_std, _, _ = designer.uncertainty(
        spectra, jax.random.PRNGKey(0), num_samples=16,
        params_norm=refined.params_norm,
    )
    assert s_mean.shape == (4, small_ds.spectrum_dim)
    assert float(s_std.mean()) > 0.0
    # the spread at the refined point is evaluated at DIFFERENT inputs than
    # the default (raw prediction) path — means must differ
    s_mean_raw, _, _, _ = designer.uncertainty(
        spectra, jax.random.PRNGKey(0), num_samples=16,
    )
    assert float(jnp.max(jnp.abs(s_mean - s_mean_raw))) > 0.0
