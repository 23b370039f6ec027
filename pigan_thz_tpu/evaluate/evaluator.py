"""Unified evaluator: the reference's four evaluation suites as jitted
batch programs (core/evaluate/unified_evaluator.py:30-533).

Where the reference streams 64-sample minibatches through torch modules and
aggregates on host with sklearn/scipy, each suite here is ONE jitted function
over the full device-resident evaluation set (1000x250 is tiny), using the
pure-JAX metric kit (pigan_thz_tpu.ops.metrics).

Suites and their reference counterparts:
- forward_network        (:186-255)  F(params)->spectrum/metrics R² (metrics
                                      compared in DEnormalized physical units
                                      via dataset metric ranges, :221);
- pigan                  (:257-343)  G param R² in denormalized units + D
                                      real/fake/overall accuracy @0.5;
- structural_prediction  (:345-413)  violation rate (pred∉[0,1]), F∘G recon
                                      error, consistency = 1/(1+err);
- model_validation       (:415-490)  cycle error, noise stability (σ=0.01),
                                      plausibility = mean σ(10·p−5).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..data.dataset import ThzDataset, denormalize_metrics, denormalize_params
from ..ops import metrics as M


class Evaluator:
    """Holds modules + trained variables; each suite is a jitted pure fn.

    `generator_out_transform` mirrors optional sigmoid squashing
    (constraint_optimizer.py:246) — identity by default.
    """

    def __init__(
        self,
        generator,
        discriminator,
        forward_model,
        g_variables,
        d_variables,
        f_variables,
        noise_sigma: float = 0.01,
        violation_window: tuple[float, float] = (0.0, 1.0),
    ):
        """violation_window: the range-violation measurement window.

        Default (0, 1) reproduces the reference quirk of judging the
        generator's tanh output (range [-1, 1]) against a [0, 1] box
        (unified_evaluator.py:380, loss.py:104-127) — which is why the
        reference records 87-91 % violation on well-trained models.  Pass
        (-1, 1) for the convention-consistent measurement.
        """
        self.generator = generator
        self.discriminator = discriminator
        self.forward_model = forward_model
        self.g_vars = g_variables
        self.d_vars = d_variables
        self.f_vars = f_variables
        self.noise_sigma = noise_sigma
        v_lo, v_hi = violation_window

        generator_ = generator
        discriminator_ = discriminator
        forward_model_ = forward_model
        sigma = noise_sigma

        def _g(gv, spectra):
            return generator_.apply(gv, spectra, train=False)

        def _d(dv, spectra, params):
            return discriminator_.apply(dv, spectra, params, train=False)

        def _f(fv, params_norm):
            out = forward_model_.apply(fv, params_norm, train=False)
            return out[0], out[1]  # uncertainty model returns 4; take means

        @jax.jit
        def forward_network(fv, ds: ThzDataset) -> Dict[str, Any]:
            pred_spec, pred_met_norm = _f(fv, ds.params_norm)
            pred_met = denormalize_metrics(pred_met_norm, ds.metric_lo, ds.metric_hi)
            real_met = denormalize_metrics(ds.metrics_norm, ds.metric_lo, ds.metric_hi)
            return {
                "spectrum_prediction": M.regression_metrics(ds.spectra, pred_spec),
                "metrics_prediction": M.regression_metrics(real_met, pred_met),
            }

        @jax.jit
        def pigan(gv, dv, ds: ThzDataset) -> Dict[str, Any]:
            pred_norm = _g(gv, ds.spectra)
            pred_phys = denormalize_params(pred_norm, ds.param_lo, ds.param_hi)
            real_scores = jax.nn.sigmoid(_d(dv, ds.spectra, ds.params))
            fake_scores = jax.nn.sigmoid(_d(dv, ds.spectra, pred_phys))
            real_acc = jnp.mean((real_scores > 0.5).astype(jnp.float32))
            fake_acc = jnp.mean((fake_scores < 0.5).astype(jnp.float32))
            return {
                "parameter_prediction": M.regression_metrics(ds.params, pred_phys),
                "discriminator_performance": {
                    "real_accuracy": real_acc,
                    "fake_accuracy": fake_acc,
                    "overall_accuracy": (real_acc + fake_acc) / 2.0,
                    "real_score_mean": jnp.mean(real_scores),
                    "fake_score_mean": jnp.mean(fake_scores),
                },
            }

        @jax.jit
        def structural_prediction(gv, fv, ds: ThzDataset) -> Dict[str, Any]:
            pred_norm = _g(gv, ds.spectra)
            violations = jnp.sum(
                (pred_norm < v_lo) | (pred_norm > v_hi), axis=1
            ).astype(jnp.float32)
            recon_spec, _ = _f(fv, pred_norm)
            err = jnp.mean((ds.spectra - recon_spec) ** 2, axis=1)
            consistency = 1.0 / (1.0 + err)
            return {
                "param_range_violation_rate": jnp.mean(
                    (violations > 0).astype(jnp.float32)
                ),
                "avg_param_violations": jnp.mean(violations),
                "reconstruction_error_mean": jnp.mean(err),
                "reconstruction_error_std": jnp.std(err),
                "consistency_score_mean": jnp.mean(consistency),
                "consistency_score_std": jnp.std(consistency),
            }

        @jax.jit
        def model_validation(gv, fv, ds: ThzDataset, key: jax.Array) -> Dict[str, Any]:
            pred_norm = _g(gv, ds.spectra)
            recon_spec, _ = _f(fv, pred_norm)
            cycle = jnp.mean((ds.spectra - recon_spec) ** 2, axis=1)

            noisy = ds.spectra + sigma * jax.random.normal(key, ds.spectra.shape)
            pred_noisy = _g(gv, noisy)
            stability = jnp.mean((pred_norm - pred_noisy) ** 2, axis=1)

            plausibility = jnp.mean(jax.nn.sigmoid(pred_norm * 10.0 - 5.0), axis=1)
            return {
                "cycle_consistency_error_mean": jnp.mean(cycle),
                "cycle_consistency_error_std": jnp.std(cycle),
                "prediction_stability_mean": jnp.mean(stability),
                "prediction_stability_std": jnp.std(stability),
                "physical_plausibility_mean": jnp.mean(plausibility),
                "physical_plausibility_std": jnp.std(plausibility),
            }

        @jax.jit
        def sample_arrays(gv, dv, fv, ds: ThzDataset, key: jax.Array):
            """Per-sample diagnostic arrays for the EvaluationVisualizer-parity
            figures (visualization.py:49-983 panels need distributions, not
            just the suite means)."""
            pred_norm = _g(gv, ds.spectra)
            pred_phys = denormalize_params(pred_norm, ds.param_lo, ds.param_hi)
            real_scores = jax.nn.sigmoid(_d(dv, ds.spectra, ds.params))[:, 0]
            fake_scores = jax.nn.sigmoid(_d(dv, ds.spectra, pred_phys))[:, 0]

            fwd_spec, fwd_met_norm = _f(fv, ds.params_norm)
            spec_err = jnp.mean((ds.spectra - fwd_spec) ** 2, axis=1)

            recon_spec, _ = _f(fv, pred_norm)
            recon_err = jnp.mean((ds.spectra - recon_spec) ** 2, axis=1)
            consistency = 1.0 / (1.0 + recon_err)
            violations = jnp.sum(
                (pred_norm < v_lo) | (pred_norm > v_hi), axis=1
            ).astype(jnp.float32)

            noisy = ds.spectra + sigma * jax.random.normal(key, ds.spectra.shape)
            stability = jnp.mean((pred_norm - _g(gv, noisy)) ** 2, axis=1)
            plausibility = jnp.mean(jax.nn.sigmoid(pred_norm * 10.0 - 5.0), axis=1)
            return {
                "pred_norm": pred_norm,
                "pred_phys": pred_phys,
                "real_params": ds.params,
                "real_scores": real_scores,
                "fake_scores": fake_scores,
                "fwd_pred_spectra": fwd_spec,
                "spectrum_err": spec_err,
                "recon_spectra": recon_spec,
                "recon_err": recon_err,
                "consistency": consistency,
                "violations": violations,
                "cycle_err": recon_err,
                "stability": stability,
                "plausibility": plausibility,
            }

        self._forward_network = forward_network
        self._pigan = pigan
        self._structural = structural_prediction
        self._validation = model_validation
        self._sample_arrays = sample_arrays

    # -- suites (public, mirror unified_evaluator method names) ----------
    def forward_network(self, ds: ThzDataset) -> Dict[str, Any]:
        return self._forward_network(self.f_vars, ds)

    def pigan(self, ds: ThzDataset) -> Dict[str, Any]:
        return self._pigan(self.g_vars, self.d_vars, ds)

    def structural_prediction(self, ds: ThzDataset) -> Dict[str, Any]:
        return self._structural(self.g_vars, self.f_vars, ds)

    def model_validation(self, ds: ThzDataset, key: jax.Array) -> Dict[str, Any]:
        return self._validation(self.g_vars, self.f_vars, ds, key)

    def sample_arrays(self, ds: ThzDataset, key: jax.Array | None = None):
        """Per-sample diagnostic arrays (host numpy) for figure builders."""
        import numpy as np

        if key is None:
            key = jax.random.PRNGKey(0)
        out = self._sample_arrays(
            self.g_vars, self.d_vars, self.f_vars, ds, key
        )
        arrays = {k: np.asarray(v) for k, v in out.items()}
        arrays["frequencies"] = np.asarray(ds.frequencies)
        arrays["spectra"] = np.asarray(ds.spectra)
        return arrays

    # -- orchestrator (run_comprehensive_evaluation :492-533) ------------
    def run_comprehensive_evaluation(
        self, ds: ThzDataset, key: jax.Array | None = None
    ) -> Dict[str, Any]:
        if key is None:
            key = jax.random.PRNGKey(0)
        results = {
            "forward_network_evaluation": self.forward_network(ds),
            "pigan_evaluation": self.pigan(ds),
            "structural_prediction_evaluation": self.structural_prediction(ds),
            "model_validation": self.model_validation(ds, key),
            "total_samples": ds.num_samples,
        }
        return jax.tree.map(
            lambda x: float(x) if hasattr(x, "shape") else x, results
        )
