"""Vectorized resonance-peak analysis (f_res, Q, FoM, sensitivity S).

The reference computes these metrics with sequential Python loops over
spectrum points (`core/utils/data_loader.py:13-58`: FWHM crossing search via
linear interpolation, Q = f_res/Δf, FoM = Q/|t_min|) and
`scipy.signal.find_peaks` for dip detection (`data_loader.py:84`).  Sequential
branchy loops do not map to the TPU VPU, so this module reformulates the whole
analysis as fixed-shape masked reductions:

- dip detection  -> local-minimum mask + two masked argmins (deepest dips,
  the second outside an exclusion window around the first);
- FWHM           -> boolean half-level crossing masks, nearest-crossing
  selection via masked max/min over an index iota, then the same linear
  interpolation as the reference;
- NaN policy     -> identical to the reference: Q/FoM are NaN when either
  half-level crossing is missing or the dip is too shallow.

Everything is jittable and `vmap`-friendly; `batched_peak_metrics` maps a
(B, N) spectrum block to the 8 reference metrics (f1,f2,Q1,FoM1,S1,Q2,FoM2,S2)
with no host round-trips — this also powers the large-scale inverse-design
screening pipeline (BASELINE.json config #5).

Known deviations from scipy.find_peaks semantics (documented, golden-
tested against this module's own sequential oracle; self-consistent
because dataset GENERATION and evaluation share these functions):

- dip qualification uses an absolute depth threshold (t <= -min_prom)
  where scipy uses topographic prominence — on spectra whose baseline
  itself approaches the threshold (noise wiggles below -1 dB), a shallow
  or absent second resonance can be assigned to a baseline minimum
  instead of scipy's fall-back-to-centre behaviour;
- the endpoint samples can qualify as local minima (the mask pads with
  +inf) where scipy never returns endpoints — a monotone roll-off tail
  can therefore register as a dip.

Both matter only for off-oracle inputs (real CSVs / degenerate model
output in screening); revisit with a prominence-style reformulation if
real-data parity at the metric level becomes a requirement.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class PeakMetrics(NamedTuple):
    f_res: jax.Array
    q: jax.Array
    fom: jax.Array
    t_min: jax.Array
    valid: jax.Array


def _local_min_mask(t: jax.Array) -> jax.Array:
    """Interior local minima of a 1-D signal (strict left, non-strict right)."""
    left = jnp.concatenate([jnp.array([jnp.inf], t.dtype), t[:-1]])
    right = jnp.concatenate([t[1:], jnp.array([jnp.inf], t.dtype)])
    return (t < left) & (t <= right)


def find_two_dips(
    t: jax.Array,
    min_prominence: float = 1.0,
    exclusion: int = 10,
) -> tuple[jax.Array, jax.Array]:
    """Indices of the two deepest transmission dips (dB, dips are negative).

    Replaces `scipy.signal.find_peaks(-t, prominence=1.0)` from
    data_loader.py:84 with a fixed-shape two-pass masked argmin.  The second
    dip must lie at least `exclusion` samples from the first.  Returned in
    frequency order (idx1 < idx2 when both valid).
    """
    n = t.shape[0]
    iota = jnp.arange(n)
    is_min = _local_min_mask(t) & (t <= -min_prominence)
    masked = jnp.where(is_min, t, jnp.inf)
    i1 = jnp.argmin(masked)
    v1_ok = jnp.isfinite(masked[i1])

    far = jnp.abs(iota - i1) > exclusion
    masked2 = jnp.where(is_min & far, t, jnp.inf)
    i2 = jnp.argmin(masked2)
    v2_ok = jnp.isfinite(masked2[i2])

    lo = jnp.minimum(i1, i2)
    hi = jnp.maximum(i1, i2)
    first = jnp.where(v2_ok, lo, i1)
    second = jnp.where(v2_ok, hi, i1)
    first = jnp.where(v1_ok, first, 0)
    second = jnp.where(v1_ok & v2_ok, second, first)
    return first, second


def _interp_crossing(freq, t, j, level):
    """Linearly interpolate the frequency where t crosses `level` in [j, j+1].

    Same interpolation as data_loader.py:25-26; falls back to freq[j] when the
    segment is flat (data_loader.py:28).
    """
    t0 = t[j]
    t1 = t[j + 1]
    denom = t1 - t0
    frac = jnp.where(jnp.abs(denom) > 1e-12, (level - t0) / denom, 0.0)
    return freq[j] + frac * (freq[j + 1] - freq[j])


def peak_parameters(
    freq: jax.Array,
    t: jax.Array,
    peak_idx: jax.Array,
    baseline: float = 0.0,
) -> PeakMetrics:
    """FWHM-based Q and FoM for one dip — vectorized analogue of
    `calculate_peak_parameters` (data_loader.py:13-58).

    A "crossing" at segment j means the half-depth level separates t[j] and
    t[j+1] (either direction, as in data_loader.py:21-22,33-34).  The nearest
    crossing strictly left / right of the dip defines the FWHM edges.
    """
    n = t.shape[0]
    f_res = freq[peak_idx]
    t_min = t[peak_idx]
    half = t_min + (baseline - t_min) / 2.0

    seg = jnp.arange(n - 1)
    above0 = t[:-1] >= half
    below1 = t[1:] < half
    crossing = (above0 & below1) | (~above0 & ~below1 & (t[:-1] < half) & (t[1:] >= half))
    # reference: left search over segments j in [0, peak_idx-1] walking down;
    # right search over j in [peak_idx+1, n-2].
    left_ok = crossing & (seg <= peak_idx - 1)
    right_ok = crossing & (seg >= peak_idx + 1)

    jl = jnp.max(jnp.where(left_ok, seg, -1))
    jr = jnp.min(jnp.where(right_ok, seg, n))
    has_l = jl >= 0
    has_r = jr < n

    f_lower = _interp_crossing(freq, t, jnp.clip(jl, 0, n - 2), half)
    f_upper = _interp_crossing(freq, t, jnp.clip(jr, 0, n - 2), half)

    delta_f = f_upper - f_lower
    valid = has_l & has_r & (delta_f > 1e-9)
    q = jnp.where(valid, f_res / jnp.where(valid, delta_f, 1.0), jnp.nan)
    fom_ok = valid & (jnp.abs(t_min) > 1e-6)
    fom = jnp.where(fom_ok, q / jnp.abs(t_min), jnp.nan)
    return PeakMetrics(f_res=f_res, q=q, fom=fom, t_min=t_min, valid=valid)


def sensitivity(f_res: jax.Array, q: jax.Array) -> jax.Array:
    """S = (f/1.0)·(Q/100)·100 with the reference's scale constants
    (data_loader.py:96,105)."""
    return jnp.where(jnp.isnan(q), jnp.nan, f_res * q)


def spectrum_metrics(
    freq: jax.Array,
    t: jax.Array,
    fallback_f1: jax.Array | float | None = None,
    fallback_f2: jax.Array | float | None = None,
    min_prominence: float = 1.0,
) -> jax.Array:
    """All 8 reference metrics for one spectrum: (f1,f2,Q1,FoM1,S1,Q2,FoM2,S2).

    When a dip is missing, f falls back to the supplied expected centre
    frequency (data_loader.py:108-109) and Q/FoM/S are NaN.
    """
    i1, i2 = find_two_dips(t, min_prominence=min_prominence)
    p1 = peak_parameters(freq, t, i1)
    p2 = peak_parameters(freq, t, i2)
    two_dips = i2 != i1

    f1 = p1.f_res
    f2 = jnp.where(two_dips, p2.f_res, jnp.nan)
    q2 = jnp.where(two_dips, p2.q, jnp.nan)
    fom2 = jnp.where(two_dips, p2.fom, jnp.nan)

    any_dip = t[i1] <= -min_prominence
    f1 = jnp.where(any_dip, f1, jnp.nan)
    q1 = jnp.where(any_dip, p1.q, jnp.nan)
    fom1 = jnp.where(any_dip, p1.fom, jnp.nan)

    if fallback_f1 is not None:
        f1 = jnp.where(jnp.isnan(f1), fallback_f1, f1)
    if fallback_f2 is not None:
        f2 = jnp.where(jnp.isnan(f2), fallback_f2, f2)

    s1 = sensitivity(f1, q1)
    s2 = sensitivity(f2, q2)
    return jnp.stack([f1, f2, q1, fom1, s1, q2, fom2, s2])


@partial(jax.jit, static_argnames=("min_prominence",))
def batched_peak_metrics(
    freq: jax.Array,
    spectra: jax.Array,
    fallback_f1: jax.Array | None = None,
    fallback_f2: jax.Array | None = None,
    min_prominence: float = 1.0,
) -> jax.Array:
    """(B, N) spectra -> (B, 8) metrics, fully on-device."""
    fn = lambda t, fb1, fb2: spectrum_metrics(
        freq, t, fb1, fb2, min_prominence=min_prominence
    )
    if fallback_f1 is None:
        fallback_f1 = jnp.full(spectra.shape[0], jnp.nan)
    if fallback_f2 is None:
        fallback_f2 = jnp.full(spectra.shape[0], jnp.nan)
    return jax.vmap(fn)(spectra, fallback_f1, fallback_f2)
