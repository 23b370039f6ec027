"""Self-verifying quality-target analysis: noise ceilings + clean oracle.

The reference publishes fixed quality targets (spectrum R2 0.9, metrics R2
0.9, cycle < 0.005 — training_optimization.py:194-215) but never asks what
is *achievable* on its noisy data.  Two tools make that reproducible here
(VERDICT.md round-1 item 3; methodology recorded in RESULTS.md):

- **Noise ceilings.** Draw the same cells twice with independent noise.
  If the draw-to-draw R2 is c = (S-N)/(S+N) (signal variance S, noise
  variance N), the best possible MODEL score against a noisy target is
  S/(S+N) = (1+c)/2.  At the default noise level this puts the spectrum-R2
  ceiling near 0.50 and the metrics-R2 ceiling near 0.78 — BELOW the 0.9
  targets, i.e. the targets are statistically unreachable on this data and
  any score above the ceiling is noise memorization.

- **Clean oracle.** The synthetic generator IS the physics oracle, so the
  same model can be scored against the noise-free truth of the same cells:
  surrogate R2 and F(G(s)) cycle error measured against what the spectrum
  actually is, not against one noisy draw of it.  (Only valid for datasets
  produced by the synthetic oracle — CSV users should pass their own clean
  reference or skip this.)
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from ..config import DataConfig
from ..data.dataset import ThzDataset, metric_ranges_from_data, normalize_metrics
from ..data.synthetic import dip_centers, sample_params, synthesize_spectra
from ..ops.metrics import r2_pooled, r2_score
from ..ops.peaks import batched_peak_metrics


def noise_ceilings(data_cfg: DataConfig, key: jax.Array | None = None) -> Dict[str, float]:
    """(1+c)/2 achievable-R2 ceilings from two independent noise draws of
    the same cells at the configured noise level."""
    if key is None:
        key = jax.random.PRNGKey(0)
    kp, k1, k2 = jax.random.split(key, 3)
    params = sample_params(kp, data_cfg.num_samples, data_cfg)
    freq = data_cfg.frequencies
    c1, c2 = dip_centers(params)
    spectra, metrics = [], []
    for kd in (k1, k2):
        spec = synthesize_spectra(freq, params, kd, data_cfg.noise_level)
        spectra.append(spec)
        metrics.append(
            batched_peak_metrics(freq, spec, fallback_f1=c1, fallback_f2=c2)
        )
    lo, hi = metric_ranges_from_data(metrics[0])
    c_spec = float(r2_score(spectra[0], spectra[1]))
    c_met = float(
        r2_score(normalize_metrics(metrics[0], lo, hi),
                 normalize_metrics(metrics[1], lo, hi))
    )
    return {
        "draw_to_draw_spectrum_r2": c_spec,
        "draw_to_draw_metrics_r2": c_met,
        "spectrum_r2_ceiling": (1.0 + c_spec) / 2.0,
        "metrics_r2_ceiling": (1.0 + c_met) / 2.0,
        # E||noisy - recon||^2 >= sigma^2 for ANY model (the additive noise
        # is independent of the reconstruction): the cycle-error target of
        # 0.005 is unreachable against noisy targets whenever sigma^2 > 0.005
        # (round-1's measured 0.0101 at sigma=0.1 sits exactly at this floor;
        # against the clean oracle the same model scores 0.00058).
        "cycle_error_floor": float(data_cfg.noise_level) ** 2,
        "noise_level": float(data_cfg.noise_level),
    }


def oracle_validation(evaluator, ds: ThzDataset) -> Dict[str, Any]:
    """Score the trained models against the NOISE-FREE truth of the same
    cells (valid only for oracle-generated datasets): pooled surrogate R2
    vs clean spectra, and the F∘G cycle error vs clean + vs noisy."""
    clean = synthesize_spectra(ds.frequencies, ds.params, key=None)

    def _f(fv, params_norm):
        out = evaluator.forward_model.apply(fv, params_norm, train=False)
        return out[0]

    @jax.jit
    def run(gv, fv):
        # fv is genuinely traced (it used to be baked in as a constant
        # while still appearing as a dead parameter — review r4)
        surrogate_spec = _f(fv, ds.params_norm)
        pred_norm = evaluator.generator.apply(gv, ds.spectra, train=False)
        recon = _f(fv, pred_norm)
        # POOLED R2 vs truth: clean spectra have near-zero variance in the
        # flat regions, so per-column averaging (the reference evaluator's
        # convention for noisy targets) degenerates to huge negatives on a
        # clean target; pooled over all elements is the meaningful score
        # (this is the RESULTS.md "pooled R2 0.9961" methodology).
        return {
            "surrogate_spectrum_r2_vs_truth": r2_pooled(clean, surrogate_spec),
            "surrogate_spectrum_r2_vs_noisy": r2_pooled(ds.spectra, surrogate_spec),
            "cycle_error_vs_truth": jnp.mean((clean - recon) ** 2),
            "cycle_error_vs_noisy": jnp.mean((ds.spectra - recon) ** 2),
        }

    out = run(evaluator.g_vars, evaluator.f_vars)
    return {k: float(v) for k, v in out.items()}
