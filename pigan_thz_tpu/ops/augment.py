"""Spectrum data augmentation (jit-friendly, pure).

The reference declares augmentation knobs — noise_level 0.05, frequency_shift
0.02, amplitude_scale 0.1 (config/training_optimization.py:103-107) — but no
trainer applies them.  Here they are implemented as a vectorized transform
usable inside the fused train step:

- additive Gaussian noise (dB domain);
- frequency shift: circular roll by a per-sample integer offset drawn from
  ±shift_frac of the spectrum length (jit-safe gather-based roll);
- amplitude scale: per-sample multiplicative jitter 1 ± scale.

Spectra remain clamped to <= 0 dB like the synthetic generator's output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def augment_spectra(
    key: jax.Array,
    spectra: jax.Array,
    noise_level: float = 0.05,
    freq_shift: float = 0.02,
    amp_scale: float = 0.1,
) -> jax.Array:
    """(B, N) -> (B, N) augmented copy; any knob set to 0 disables it."""
    b, n = spectra.shape
    k_noise, k_shift, k_amp = jax.random.split(key, 3)
    out = spectra

    if freq_shift > 0.0:
        max_shift = max(1, int(round(freq_shift * n)))
        shifts = jax.random.randint(k_shift, (b,), -max_shift, max_shift + 1)
        idx = (jnp.arange(n)[None, :] - shifts[:, None]) % n
        out = jnp.take_along_axis(out, idx, axis=1)

    if amp_scale > 0.0:
        scale = 1.0 + amp_scale * jax.random.uniform(k_amp, (b, 1), minval=-1.0, maxval=1.0)
        out = out * scale

    if noise_level > 0.0:
        out = out + noise_level * jax.random.normal(k_noise, out.shape, out.dtype)

    return jnp.minimum(out, 0.0)
