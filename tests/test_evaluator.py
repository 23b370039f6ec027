"""Evaluator suite tests: structure, value sanity, and oracle checks for the
metric kit (sklearn/scipy as oracles, matching unified_evaluator.py:138-184)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu.evaluate import Evaluator, generate_summary_report
from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.ops import metrics as M


def test_metric_kit_against_sklearn():
    from scipy.stats import pearsonr
    from sklearn.metrics import mean_absolute_error, mean_squared_error, r2_score

    rng = np.random.default_rng(0)
    y = rng.normal(size=(64, 5)).astype(np.float32)
    p = (y + 0.3 * rng.normal(size=y.shape)).astype(np.float32)
    got = {k: float(v) for k, v in M.regression_metrics(jnp.asarray(y), jnp.asarray(p)).items()}
    assert got["mse"] == pytest.approx(mean_squared_error(y, p), rel=1e-5)
    assert got["mae"] == pytest.approx(mean_absolute_error(y, p), rel=1e-5)
    # sklearn default multioutput='uniform_average' — the reference's call
    assert got["r2"] == pytest.approx(r2_score(y, p), rel=1e-4)
    expected_pearson = np.mean([pearsonr(y[:, i], p[:, i])[0] for i in range(5)])
    assert got["pearson_r"] == pytest.approx(expected_pearson, rel=1e-4)
    mape = np.mean(np.abs((y - p) / (y + 1e-8))) * 100
    assert got["mape"] == pytest.approx(mape, rel=1e-3)


def test_r2_perfect_and_mean_predictor():
    y = jnp.arange(10.0)[:, None]
    assert float(M.r2_score(y, y)) == pytest.approx(1.0)
    mean_pred = jnp.full_like(y, float(y.mean()))
    assert float(M.r2_score(y, mean_pred)) == pytest.approx(0.0, abs=1e-6)


@pytest.fixture(scope="module")
def evaluator(cfg, small_ds):
    g, d, f = build_trio(cfg)
    k = jax.random.PRNGKey(0)
    gv = g.init(k, small_ds.spectra[:2], train=False)
    dv = d.init(k, small_ds.spectra[:2], small_ds.params[:2], train=False)
    fv = f.init({"params": k, "dropout": k}, small_ds.params_norm[:2], train=False)
    return Evaluator(g, d, f, gv, dv, fv)


def test_comprehensive_evaluation_structure(evaluator, small_ds):
    res = evaluator.run_comprehensive_evaluation(small_ds)
    assert set(res) >= {
        "forward_network_evaluation",
        "pigan_evaluation",
        "structural_prediction_evaluation",
        "model_validation",
        "total_samples",
    }
    fwd = res["forward_network_evaluation"]
    assert set(fwd["spectrum_prediction"]) == {"mse", "mae", "rmse", "r2", "pearson_r", "mape"}
    dp = res["pigan_evaluation"]["discriminator_performance"]
    assert 0.0 <= dp["overall_accuracy"] <= 1.0
    st = res["structural_prediction_evaluation"]
    assert 0.0 <= st["param_range_violation_rate"] <= 1.0
    # consistency = 1/(1+err) in (0, 1]
    assert 0.0 < st["consistency_score_mean"] <= 1.0
    mv = res["model_validation"]
    assert mv["prediction_stability_mean"] >= 0.0
    assert 0.0 <= mv["physical_plausibility_mean"] <= 1.0
    assert all(np.isfinite(v) for v in jax.tree_util.tree_leaves(res))


def test_report_generation(evaluator, small_ds, tmp_path):
    res = evaluator.run_comprehensive_evaluation(small_ds)
    path = str(tmp_path / "report.txt")
    content = generate_summary_report(res, save_path=path)
    assert "OVERALL RATING" in content
    assert "FORWARD NETWORK EVALUATION" in content
    with open(path) as fh:
        assert fh.read() == content


def test_r2_constant_column_matches_sklearn():
    """Constant-y_true columns (e.g. clamped 0 dB spectrum regions on
    noise-free data) follow sklearn's convention — 1.0 when exact, 0.0
    otherwise — instead of the former 1-rss blowup (review r4)."""
    import warnings

    from sklearn.metrics import r2_score as sk_r2

    y = np.zeros((8, 2), np.float32)
    y[:, 1] = np.arange(8)
    p = y.copy()
    p[:, 0] = 0.1
    got = np.asarray(M.r2_per_column(jnp.asarray(y), jnp.asarray(p)))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        want = sk_r2(y, p, multioutput="raw_values")
    np.testing.assert_allclose(got, want, atol=1e-6)
    exact = np.asarray(M.r2_per_column(jnp.asarray(y), jnp.asarray(y)))
    np.testing.assert_allclose(exact, [1.0, 1.0], atol=1e-6)
