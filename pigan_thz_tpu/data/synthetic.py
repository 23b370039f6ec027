"""Synthetic THz metamaterial spectrum generator (vectorized, JAX).

The reference ships a per-sample NumPy generator
(`core/utils/data_loader.py:62-111`): two Gaussian absorption dips whose
centre / depth / width are linear in the structural parameters (r1, r2, w, g),
a tanh high-frequency roll-off, a linear offset, additive Gaussian noise, and
a clamp at 0 dB.  The real CSV dataset is absent from the repo
(`.MISSING_LARGE_BLOBS:1`), so this generator is the framework's
self-sufficient data source AND the golden-test oracle.

TPU-native differences from the reference implementation:
- fully batched: one `vmap`-free broadcasted expression produces (B, N)
  spectra in a single XLA program instead of a Python loop per sample;
- metric extraction (f1, f2, Q, FoM, S) uses the fixed-shape masked-reduction
  peak analysis in `pigan_thz_tpu.ops.peaks` instead of
  `scipy.signal.find_peaks` + Python FWHM loops;
- deterministic via explicit PRNG keys rather than global NumPy state.

Physics-model constants follow data_loader.py:64-77 so spectra are
statistically interchangeable with the reference's.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import DataConfig
from ..ops.peaks import batched_peak_metrics

# Model constants (data_loader.py:64-77).
_C1_BASE, _C1_R1, _C1_W = 0.870, 0.05, 0.03
_D1_BASE, _D1_R2, _D1_G = -12.657, 1.5, -1.0
_W1_BASE, _W1_R1 = 0.08, 0.02
_C2_BASE, _C2_R2, _C2_G = 2.115, 0.07, 0.04
_D2_BASE, _D2_R1, _D2_W = -11.763, 1.0, -0.8
_W2_BASE, _W2_R2 = 0.15, 0.03
_PARAM_CENTER = 2.5


class SyntheticBatch(NamedTuple):
    """Device-resident raw (physical-unit) synthetic samples."""

    spectra: jax.Array      # (B, N) transmission in dB, <= 0
    params: jax.Array       # (B, 4) physical units (r1, r2, w, g)
    metrics: jax.Array      # (B, 8) f1,f2,Q1,FoM1,S1,Q2,FoM2,S2 (NaN allowed)


def dip_centers(params: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Expected resonance centres for fallback f1/f2 (data_loader.py:64,69)."""
    r1, r2, w, g = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    c1 = _C1_BASE + (r1 - _PARAM_CENTER) * _C1_R1 + (w - _PARAM_CENTER) * _C1_W
    c2 = _C2_BASE + (r2 - _PARAM_CENTER) * _C2_R2 + (g - _PARAM_CENTER) * _C2_G
    return c1, c2


def synthesize_spectra(
    freq: jax.Array,
    params: jax.Array,
    key: jax.Array | None = None,
    noise_level: float = 0.1,
    apply_offset: bool = True,
) -> jax.Array:
    """(B, 4) physical params -> (B, N) dB spectra.  Pure, broadcasted."""
    r1, r2, w, g = (params[:, i : i + 1] for i in range(4))
    f = freq[None, :]

    c1, c2 = dip_centers(params)
    c1, c2 = c1[:, None], c2[:, None]
    d1 = _D1_BASE + (r2 - _PARAM_CENTER) * _D1_R2 + (g - _PARAM_CENTER) * _D1_G
    w1 = _W1_BASE + jnp.abs((r1 - _PARAM_CENTER) * _W1_R1)
    d2 = _D2_BASE + (r1 - _PARAM_CENTER) * _D2_R1 + (w - _PARAM_CENTER) * _D2_W
    w2 = _W2_BASE + jnp.abs((r2 - _PARAM_CENTER) * _W2_R2)

    t = d1 * jnp.exp(-((f - c1) ** 2) / (2.0 * w1**2))
    t = t + d2 * jnp.exp(-((f - c2) ** 2) / (2.0 * w2**2))
    t = t - 0.5 * (jnp.tanh((f - 1.5) * 2.0) + 1.0)   # roll-off (dl.py:74)
    if apply_offset:
        t = t + (-0.5 + 0.5 * (f / 3.0))               # offset (dl.py:76)
    if key is not None and noise_level > 0.0:
        t = t + noise_level * jax.random.normal(key, t.shape, t.dtype)
    return jnp.minimum(t, 0.0)                          # clamp (dl.py:80)


def sample_params(key: jax.Array, n: int, cfg: DataConfig) -> jax.Array:
    """Uniform physical parameters in [param_min, param_max]^4."""
    return jax.random.uniform(
        key, (n, cfg.param_dim), minval=cfg.param_min, maxval=cfg.param_max
    )


@partial(jax.jit, static_argnames=("n", "cfg", "with_noise"))
def generate_dataset(
    key: jax.Array, n: int, cfg: DataConfig, with_noise: bool = True
) -> SyntheticBatch:
    """Generate a full synthetic dataset on device in one XLA program.

    Equivalent in content to the missing
    `dataset/THz_Metamaterial_Spectra_With_Metrics.csv` (1000 rows x
    [4 params + 250 Freq_x.xx cols + 8 metrics]).
    """
    kp, kn = jax.random.split(key)
    freq = cfg.frequencies
    params = sample_params(kp, n, cfg)
    spectra = synthesize_spectra(
        freq, params, kn if with_noise else None, cfg.noise_level
    )
    c1, c2 = dip_centers(params)
    metrics = batched_peak_metrics(freq, spectra, fallback_f1=c1, fallback_f2=c2)
    return SyntheticBatch(spectra=spectra, params=params, metrics=metrics)
