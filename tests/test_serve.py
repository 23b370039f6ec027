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


def test_make_inverse_design_fn_pallas_matches_xla(models, small_ds):
    """The fused TPU serving path (interpret mode on CPU) must reproduce the
    XLA path numerically — same contract the measured 1.37x speedup rides."""
    from pigan_thz_tpu.serve import make_inverse_design_fn

    g, f, gv, fv = models
    xla_fn = make_inverse_design_fn(g, f, gv, fv, small_ds)
    pl_fn = make_inverse_design_fn(
        g, f, gv, fv, small_ds, use_pallas=True, pallas_interpret=True
    )
    x = small_ds.spectra[:16]
    for a, b in zip(xla_fn(x), pl_fn(x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_pallas_export_is_tpu_only(models, small_ds, tmp_path):
    """use_pallas exports must target the tpu platform exclusively (Mosaic
    custom calls have no CPU/CUDA lowering)."""
    from pigan_thz_tpu.serve import _platforms

    assert _platforms(True) == ("tpu",)
    assert _platforms(False) == ("cpu", "cuda", "tpu")


def test_make_inverse_design_fn_bf16_close_to_fp32(models, small_ds):
    """bf16 serving path: fp32 outputs, small numeric delta (the measured
    2.06x serving win at B=65536 on v5e-1)."""
    from pigan_thz_tpu.serve import make_inverse_design_fn

    g, f, gv, fv = models
    fp32 = make_inverse_design_fn(g, f, gv, fv, small_ds)
    bf16 = make_inverse_design_fn(g, f, gv, fv, small_ds,
                                  compute_dtype=jnp.bfloat16)
    x = small_ds.spectra[:32]
    a, b = fp32(x), bf16(x)
    for u, v in zip(a, b):
        assert v.dtype == jnp.float32
    # params in [-1,1]-derived physical units: bf16 error well under 0.01
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=0.01)
    # spectra ~ -12 dB scale: sub-0.2 dB agreement
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=0.2)


@pytest.mark.slow
def test_cli_export_artifacts(models, small_ds, tmp_path):
    """CLI export writes loadable artifacts for all three surfaces."""
    import os

    from pigan_thz_tpu.cli import main
    from pigan_thz_tpu.serve import load_exported
    from pigan_thz_tpu.train import Trainer, checkpoint as ckpt
    from pigan_thz_tpu import default_config
    from pigan_thz_tpu.config import DataConfig

    g, f, gv, fv = models
    saved = tmp_path / "saved_models"
    # write finals via the normal contract (D vars from a fresh init)
    from pigan_thz_tpu.models import build_trio

    cfg = default_config().replace(data=DataConfig(num_samples=256))
    _, d, _ = build_trio(cfg)
    dv = d.init(jax.random.PRNGKey(0), small_ds.spectra[:2],
                small_ds.params[:2], train=False)
    ckpt.save_pytree(str(saved), ckpt.GENERATOR_FINAL, gv)
    ckpt.save_pytree(str(saved), ckpt.DISCRIMINATOR_FINAL, dv)
    ckpt.save_pytree(str(saved), ckpt.FORWARD_MODEL_FINAL, fv)

    out = tmp_path / "exported"
    rc = main([
        "export", "--models", str(saved), "--out", str(out),
        "--artifact", "all", "--batch-size", "8",
        "--set", "data.num_samples=256",
    ])
    assert rc == 0
    for name in ("designer.stablehlo", "generator.stablehlo",
                 "surrogate.stablehlo"):
        path = out / name
        assert path.exists() and path.stat().st_size > 100_000, name
    fn = load_exported(str(out / "designer.stablehlo"))
    params, spec, met = fn(small_ds.spectra[:8])
    assert params.shape == (8, 4) and met.shape == (8, 8)


def test_bf16_exports_cover_generator_and_surrogate(models, small_ds, tmp_path):
    """--dtype bfloat16 must bake bf16 into ALL artifacts (review r4: the
    generator/surrogate exports silently ignored every non-int8 dtype and
    shipped fp32)."""
    g, f, gv, fv = models
    gp = str(tmp_path / "gen_bf16.stablehlo")
    export_generator(g, gv, small_ds, gp, batch_size=8,
                     compute_dtype=jnp.bfloat16)
    out = load_exported(gp)(small_ds.spectra[:8])
    from pigan_thz_tpu.data.dataset import denormalize_params

    want = denormalize_params(
        g.apply(gv, small_ds.spectra[:8], train=False),
        small_ds.param_lo, small_ds.param_hi,
    )
    assert np.asarray(out).dtype == np.float32          # fp32 outputs
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=0.05)               # bf16 tolerance

    fp = str(tmp_path / "fwd_bf16.stablehlo")
    export_forward_surrogate(f, fv, small_ds, fp, batch_size=8,
                             compute_dtype=jnp.bfloat16)
    spec, met = load_exported(fp)(small_ds.params_norm[:8])
    ref_spec, ref_met = f.apply(fv, small_ds.params_norm[:8], train=False)
    assert np.asarray(spec).dtype == np.float32
    np.testing.assert_allclose(np.asarray(spec), np.asarray(ref_spec),
                               atol=0.5)                # dB scale, bf16
    np.testing.assert_allclose(np.asarray(met), np.asarray(ref_met),
                               atol=0.05)


def test_ensemble_mean_export_roundtrip(cfg, small_ds, tmp_path):
    """The ensemble-mean predictor (the measured best held-out scorer)
    exports as one StableHLO artifact whose output equals averaging the
    member generators' normalized predictions in-process (round 5)."""
    from pigan_thz_tpu.data.dataset import denormalize_params
    from pigan_thz_tpu.parallel.ensemble import init_ensemble_states
    from pigan_thz_tpu.serve import (
        export_ensemble_inverse_design,
        make_ensemble_inverse_design_fn,
    )
    from pigan_thz_tpu.train.state import make_optimizers

    g, d, f = build_trio(cfg)
    g_tx, d_tx, _ = make_optimizers(cfg, 4)
    states = init_ensemble_states(
        g, d, f, g_tx, d_tx, 3, jax.random.PRNGKey(5),
        spectrum_dim=small_ds.spectrum_dim,
    )
    f_vars = jax.tree_util.tree_map(lambda x: x[0], states.f).variables
    spectra = small_ds.spectra[:16]

    fn = make_ensemble_inverse_design_fn(
        g, f, states.g.variables, f_vars, small_ds
    )
    params_phys, recon, met = fn(spectra)
    # oracle: mean of member predictions
    preds = jnp.stack([
        g.apply(jax.tree_util.tree_map(lambda x: x[m], states.g).variables,
                spectra, train=False)
        for m in range(3)
    ])
    expected = denormalize_params(
        preds.mean(axis=0), small_ds.param_lo, small_ds.param_hi
    )
    np.testing.assert_allclose(
        np.asarray(params_phys), np.asarray(expected), atol=1e-5
    )
    assert recon.shape == (16, small_ds.spectrum_dim)

    path = str(tmp_path / "ens.stablehlo")
    export_ensemble_inverse_design(
        g, f, states.g.variables, f_vars, small_ds, path, batch_size=16
    )
    out = load_exported(path)(spectra)
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(params_phys), atol=1e-5
    )


def test_cli_export_ensemble(cfg, small_ds, tmp_path, monkeypatch):
    """CLI: seed_search-style 'ensemble_best' snapshot -> one artifact."""
    from pigan_thz_tpu.cli import main
    from pigan_thz_tpu.parallel.ensemble import init_ensemble_states
    from pigan_thz_tpu.train import checkpoint as ckpt
    from pigan_thz_tpu.train.state import make_optimizers

    g, d, f = build_trio(cfg)
    g_tx, d_tx, _ = make_optimizers(cfg, 4)
    states = init_ensemble_states(
        g, d, f, g_tx, d_tx, 2, jax.random.PRNGKey(1),
        spectrum_dim=small_ds.spectrum_dim,
    )
    models_dir = str(tmp_path / "models")
    ckpt.save_pytree(models_dir, "ensemble_best", states)
    out_dir = str(tmp_path / "exported")
    rc = main([
        "export", "--models", models_dir, "--artifact", "ensemble",
        "--ensemble-members", "2", "--out", out_dir, "--batch-size", "8",
        "--set", f"data.num_samples={small_ds.num_samples}",
    ])
    assert rc == 0
    import os as _os

    art = _os.path.join(out_dir, "ensemble_designer.stablehlo")
    assert _os.path.exists(art)
    out = load_exported(art)(small_ds.spectra[:8])
    assert np.isfinite(np.asarray(out[0])).all()
    # missing member count fails fast
    with pytest.raises(SystemExit):
        main(["export", "--models", models_dir, "--artifact", "ensemble",
              "--out", out_dir])
