"""StableHLO export/serve tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.serve import (
    export_forward_surrogate,
    export_generator,
    export_inverse_design,
    load_exported,
)


@pytest.fixture(scope="module")
def models(cfg, small_ds):
    g, d, f = build_trio(cfg)
    k = jax.random.PRNGKey(0)
    gv = g.init(k, small_ds.spectra[:2], train=False)
    fv = f.init({"params": k, "dropout": k}, small_ds.params_norm[:2], train=False)
    return g, f, gv, fv


def test_generator_export_roundtrip(models, small_ds, tmp_path):
    g, f, gv, fv = models
    path = str(tmp_path / "gen.stablehlo")
    export_generator(g, gv, small_ds, path, batch_size=16)
    fn = load_exported(path)
    out = fn(small_ds.spectra[:16])
    from pigan_thz_tpu.data.dataset import denormalize_params

    expected = denormalize_params(
        g.apply(gv, small_ds.spectra[:16], train=False),
        small_ds.param_lo, small_ds.param_hi,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_forward_export_roundtrip(models, small_ds, tmp_path):
    g, f, gv, fv = models
    path = str(tmp_path / "fwd.stablehlo")
    export_forward_surrogate(f, fv, small_ds, path, batch_size=8)
    fn = load_exported(path)
    spec, met = fn(small_ds.params_norm[:8])
    ref_spec, ref_met = f.apply(fv, small_ds.params_norm[:8], train=False)
    np.testing.assert_allclose(np.asarray(spec), np.asarray(ref_spec), atol=1e-5)
    np.testing.assert_allclose(np.asarray(met), np.asarray(ref_met), atol=1e-5)


def test_inverse_design_export(models, small_ds, tmp_path):
    g, f, gv, fv = models
    path = str(tmp_path / "designer.stablehlo")
    export_inverse_design(g, f, gv, fv, small_ds, path, batch_size=8)
    fn = load_exported(path)
    params, spec, met = fn(small_ds.spectra[:8])
    assert params.shape == (8, 4)
    assert spec.shape == (8, small_ds.spectrum_dim)
    assert met.shape == (8, 8)
    # physical units in the design box
    assert float(jnp.min(params)) >= float(small_ds.param_lo.min()) - 1e-4


def test_export_wrong_batch_errors(models, small_ds, tmp_path):
    g, f, gv, fv = models
    path = str(tmp_path / "gen8.stablehlo")
    export_generator(g, gv, small_ds, path, batch_size=8)
    fn = load_exported(path)
    with pytest.raises(Exception):
        fn(small_ds.spectra[:4])  # shape mismatch must not silently pass
