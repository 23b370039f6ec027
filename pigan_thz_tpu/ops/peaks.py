"""Vectorized resonance-peak analysis (f_res, Q, FoM, sensitivity S).

The reference computes these metrics with sequential Python loops over
spectrum points (`core/utils/data_loader.py:13-58`: FWHM crossing search via
linear interpolation, Q = f_res/Δf, FoM = Q/|t_min|) and
`scipy.signal.find_peaks(-t, prominence=1.0, width=1)` for dip detection
(`data_loader.py:84`), selecting the qualified dip CLOSEST to each expected
resonance centre (`data_loader.py:91-105`) with centre-frequency fallback
when absent (`data_loader.py:108-109`).

Sequential branchy loops do not map to the TPU VPU, so this module
reformulates the whole analysis as fixed-shape masked reductions over an
(N, N) index lattice (N = 250 spectrum points — trivially VPU-sized):

- dip detection  -> scipy-parity `find_peaks` semantics, vectorized:
  plateau-aware local maxima (plateau midpoint, endpoints never qualify),
  topographic prominence via masked window minima between the peak and its
  nearest strictly-higher samples, and interpolated width at half
  prominence (`rel_height=0.5`), with `prominence >= 1.0` and `width >= 1`
  qualification exactly as the reference's call;
- dip selection  -> closest-to-expected-centre among qualified dips when
  centres are supplied (reference parity), deepest-two otherwise;
- FWHM           -> boolean half-level crossing masks, nearest-crossing
  selection via masked max/min over an index iota, then the same linear
  interpolation as the reference;
- NaN policy     -> identical to the reference: Q/FoM are NaN when either
  half-level crossing is missing or the dip is too shallow; f falls back
  to the expected centre when no dip qualifies.

Everything is jittable and `vmap`-friendly; `batched_peak_metrics` maps a
(B, N) spectrum block to the 8 reference metrics (f1,f2,Q1,FoM1,S1,Q2,FoM2,S2)
with no host round-trips — this also powers the large-scale inverse-design
screening pipeline (BASELINE.json config #5).  Golden-tested for exact dip
selection agreement against real `scipy.signal.find_peaks` on adversarial
spectra classes (noisy baselines near threshold, monotone roll-off tails,
endpoint dips, plateau bottoms) in tests/test_peaks.py.

Known precision boundary: this module computes in float32 (the TPU compute
dtype) while scipy computes in float64, so a dip whose TRUE prominence or
width sits within float32 rounding (~1e-7 relative) of the filter
threshold can be qualified differently — e.g. a plateau dip of exact
width 1 + 4e-16 samples qualifies in scipy but rounds to 0.99999976 here.
Index selection is exact everywhere else (fuzzed, including a quantized-
spectra class that generates such knife-edge cases); the boundary cases
are physically meaningless (a width measured to the last ulp of a sample).
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


class DipQualification(NamedTuple):
    """Per-index dip analysis for one spectrum (all arrays shaped (N,)).

    `qualified[i]` is True iff scipy's
    `find_peaks(-t, prominence=min_prominence, width=min_width)` would
    return index i.  `prominence`/`width` carry the underlying measures
    (meaningful only where `is_peak`); non-peak rows hold don't-care
    values.
    """

    qualified: jax.Array     # bool — passes prominence AND width filters
    is_peak: jax.Array       # bool — plateau-midpoint local maximum of -t
    prominence: jax.Array    # topographic prominence of -t at the peak
    width: jax.Array         # interpolated width (samples) at half prominence


def _vtake(x: jax.Array, idx: jax.Array) -> jax.Array:
    """x[idx] as a one-hot masked reduction.

    Mosaic (Pallas TPU) has no vector-gather lowering for x[vector_idx];
    selecting via the (N, N) lattice keeps the whole qualification body
    kernel-compatible, and costs one more lattice pass each — noise next
    to the existing reductions."""
    n = x.shape[0]
    j = jnp.arange(n)[None, :]
    return jnp.sum(jnp.where(j == idx[:, None], x[None, :], 0.0), axis=1)


def dip_qualification(
    t: jax.Array,
    min_prominence: float = 1.0,
    min_width: float = 1.0,
    _mosaic_safe: bool = False,
) -> DipQualification:
    """scipy `find_peaks(-t, prominence, width)` parity, fully vectorized.

    Semantics matched against scipy 1.x `_local_maxima_1d`,
    `_peak_prominences` (wlen=None) and `_peak_widths` (rel_height=0.5):

    - a local maximum of x = -t is a sample strictly above its nearest
      differing neighbours on both sides; flat plateaus report their
      midpoint; endpoints never qualify;
    - prominence: walk outward from the peak until a strictly higher
      sample (or the signal border); the base on each side is the window
      minimum; prominence = x[peak] - max(left_min, right_min);
    - width: evaluation height = x[peak] - 0.5*prominence; the first
      sample at-or-below that height walking toward each base defines the
      (linearly interpolated) intersection; width = right_ip - left_ip.

    Every per-index query is a masked reduction over the (N, N) index
    lattice — pure VPU work with no data-dependent control flow (an
    O(N log N) sparse-table/binary-lifting variant was measured 8x SLOWER
    on v5e: its per-level `take_along_axis` walks lower to TPU gathers,
    which cost far more than the brute-force lattice).  For large batches
    `batched_dip_qualification` runs this same math inside a Pallas
    kernel so the lattice intermediates stay in VMEM.

    Replaces the pre-round-5 absolute-depth heuristic — the reference
    qualifies dips by topographic prominence (`data_loader.py:84`), which
    differs on noisy baselines and monotone roll-off tails.
    """
    x = -t
    n = x.shape[0]
    iota = jnp.arange(n)
    i = iota[:, None]            # peak-candidate axis
    j = iota[None, :]            # scan axis
    xi = x[:, None]
    xj = x[None, :]

    # --- plateau-aware local maxima (scipy _local_maxima_1d) ---
    # nearest differing neighbour = the closer of (nearest strictly
    # higher, nearest strictly lower); it is LOWER iff the lower one is
    # the nearer — which removes the x[ld]/x[rd] gathers entirely (two
    # fewer lattice passes; Mosaic also has no vector gather)
    take = _vtake if _mosaic_safe else (lambda a, k: a[k])
    greater = xj > xi
    lower = xj < xi
    left = j < i
    right = j > i
    lg = jnp.max(jnp.where(greater & left, j, -1), axis=1)   # last strictly-higher left
    rg = jnp.min(jnp.where(greater & right, j, n), axis=1)   # first strictly-higher right
    llt = jnp.max(jnp.where(lower & left, j, -1), axis=1)    # last strictly-lower left
    rlt = jnp.min(jnp.where(lower & right, j, n), axis=1)    # first strictly-lower right
    ld = jnp.maximum(lg, llt)                                # nearest differing left
    rd = jnp.minimum(rg, rlt)                                # nearest differing right
    run_is_peak = (ld >= 0) & (llt > lg) & (rd <= n - 1) & (rlt < rg)
    midpoint = (ld + rd) // 2    # ((ld+1) + (rd-1)) // 2 — plateau midpoint
    is_peak = run_is_peak & (iota == midpoint)

    # --- topographic prominence (scipy _peak_prominences, wlen=None) ---
    lwin = (j > lg[:, None]) & (j <= i)      # (lg, i]
    rwin = (j >= i) & (j < rg[:, None])      # [i, rg)
    left_min = jnp.min(jnp.where(lwin, xj, jnp.inf), axis=1)
    right_min = jnp.min(jnp.where(rwin, xj, jnp.inf), axis=1)
    prominence = x - jnp.maximum(left_min, right_min)

    # --- interpolated width at rel_height=0.5 (scipy _peak_widths) ---
    # the crossing search is bounded by the peak's base in scipy's walk,
    # but the bound is never binding: x[base] <= x[peak] - prominence <
    # height, so the nearest at-or-below sample IS inside (lg, i) for a
    # true peak — the unbounded nearest search is equivalent
    height = x - 0.5 * prominence
    at_or_below = xj <= height[:, None]
    jl = jnp.max(jnp.where(at_or_below & (j < i), j, -1), axis=1)
    jr = jnp.min(jnp.where(at_or_below & (j > i), j, n), axis=1)
    width = _interp_width(x, n, height, jl, jr, take)

    qualified = is_peak & (prominence >= min_prominence) & (width >= min_width)
    return DipQualification(
        qualified=qualified, is_peak=is_peak, prominence=prominence, width=width
    )


def _interp_width(x, n, height, jl, jr, take=lambda a, k: a[k]):
    """scipy _peak_widths intersection interpolation given the stop samples."""
    jl_c = jnp.clip(jl, 0, n - 1)
    jr_c = jnp.clip(jr, 0, n - 1)
    x_jl = take(x, jl_c)
    x_jl1 = take(x, jnp.clip(jl_c + 1, 0, n - 1))
    x_jr = take(x, jr_c)
    x_jr1 = take(x, jnp.clip(jr_c - 1, 0, n - 1))
    # interpolate only when the stop sample is strictly below the height
    # (scipy: `if x[i] < height`); denominators are positive there because
    # the neighbouring sample toward the peak is strictly above the height
    dl = jnp.where(x_jl1 != x_jl, x_jl1 - x_jl, 1.0)
    dr = jnp.where(x_jr1 != x_jr, x_jr1 - x_jr, 1.0)
    left_ip = jl_c + jnp.where(x_jl < height, (height - x_jl) / dl, 0.0)
    right_ip = jr_c - jnp.where(x_jr < height, (height - x_jr) / dr, 0.0)
    return right_ip - left_ip


def _dip_qualification_lifted(
    t: jax.Array,
    min_prominence: float = 1.0,
    min_width: float = 1.0,
) -> DipQualification:
    """Same semantics as `dip_qualification`, O(N log N) via sparse tables.

    Every per-index query (nearest neighbour satisfying a comparison
    against a per-query threshold; range-min over the prominence window)
    is answered in O(log N) branchless binary-descent steps against
    max/min tables over dyadic blocks.  This is the CPU batch path:
    ~16x the dense lattice on CPU — but 8x SLOWER on TPU, where
    the per-level `take_along_axis` walks lower to hardware-hostile
    gathers (measured; RESULTS.md "Pallas peaks kernel") — so
    `batched_dip_qualification` routes TPU to the Pallas lattice kernel
    and everything else here.  Cross-checked against the dense form in
    the fuzz tests."""
    x = -t
    n = x.shape[0]
    iota = jnp.arange(n)
    K = max(1, (n - 1).bit_length())     # 2^K >= n
    pad = 1 << K

    # sparse tables over the padded signal: level k holds the max / min of
    # [j, j+2^k); sentinels (-inf / +inf) make out-of-range samples
    # non-qualifying for every predicate used below.  (jnp.roll wraps, but
    # blocks starting inside the real signal never reach the wrapped
    # region, and blocks starting in the sentinel run only ever delay a
    # walk that is already out of range.)
    xp_max = jnp.concatenate([x, jnp.full((pad,), -jnp.inf, x.dtype)])
    xp_min = jnp.concatenate([x, jnp.full((pad,), jnp.inf, x.dtype)])
    maxt = [xp_max]
    mint = [xp_min]
    for k in range(1, K + 1):
        h = 1 << (k - 1)
        maxt.append(jnp.maximum(maxt[-1], jnp.roll(maxt[-1], -h)))
        mint.append(jnp.minimum(mint[-1], jnp.roll(mint[-1], -h)))

    def nearest_left(tabs, thr, has):
        """Largest j < i with has(x[j], thr[i]); -1 if none.

        Branchless binary descent: greedily extend the non-qualifying
        suffix [hi, i) by dyadic blocks, largest first — the accepted
        block sizes are exactly the binary digits of the suffix length."""
        hi = iota
        for k in range(K - 1, -1, -1):
            cand = hi - (1 << k)
            agg = tabs[k][jnp.clip(cand, 0, None)]
            skip = (cand >= 0) & ~has(agg, thr)
            hi = jnp.where(skip, cand, hi)
        return hi - 1

    def nearest_right(tabs, thr, has):
        """Smallest j > i with has(x[j], thr[i]); n if none."""
        lo = iota + 1
        for k in range(K - 1, -1, -1):
            agg = tabs[k][lo]      # block [lo, lo + 2^k); padding in range
            skip = ~has(agg, thr)
            lo = jnp.where(skip, lo + (1 << k), lo)
        return jnp.minimum(lo, n)

    gt = lambda agg, thr: agg > thr    # tabs=maxt: block max > thr
    lt = lambda agg, thr: agg < thr    # tabs=mint: block min < thr
    le = lambda agg, thr: agg <= thr   # tabs=mint: block min <= thr

    # --- plateau-aware local maxima (scipy _local_maxima_1d) ---
    lgt = nearest_left(maxt, x, gt)      # last strictly-higher left
    llt = nearest_left(mint, x, lt)      # last strictly-lower left
    rgt = nearest_right(maxt, x, gt)     # first strictly-higher right
    rlt = nearest_right(mint, x, lt)     # first strictly-lower right
    ld = jnp.maximum(lgt, llt)           # nearest differing left
    rd = jnp.minimum(rgt, rlt)           # nearest differing right
    # the closer differing neighbour is lower iff the lower one is nearer
    left_lower = llt > lgt
    right_lower = rlt < rgt
    run_is_peak = (ld >= 0) & left_lower & (rd <= n - 1) & right_lower
    midpoint = (ld + rd) // 2            # plateau midpoint
    is_peak = run_is_peak & (iota == midpoint)

    # --- prominence: range-min over the walk windows (lg, i] and [i, rg) ---
    def range_min(l, r):
        """min x over [l, r] inclusive (l <= r) — two overlapping blocks."""
        length = r - l + 1
        kq = jnp.zeros_like(length)
        for k in range(1, K + 1):
            kq = jnp.where(length >= (1 << k), k, kq)
        stacked = jnp.stack(mint)                      # (K+1, n+pad)
        left_block = stacked[kq, l]
        right_block = stacked[kq, jnp.clip(r - (1 << kq) + 1, 0, None)]
        return jnp.minimum(left_block, right_block)

    left_min = range_min(jnp.clip(lgt + 1, 0, None), iota)
    right_min = range_min(iota, jnp.clip(rgt - 1, None, n - 1))
    prominence = x - jnp.maximum(left_min, right_min)

    # --- width at rel_height=0.5: nearest at-or-below the eval height ---
    # (unbounded search ≡ scipy's base-bounded walk for true peaks:
    # x[base] <= x[peak] - prominence < height, so a qualifying sample
    # exists strictly inside the prominence window)
    height = x - 0.5 * prominence
    jl = nearest_left(mint, height, le)
    jr = nearest_right(mint, height, le)
    width = _interp_width(x, n, height, jl, jr)

    qualified = is_peak & (prominence >= min_prominence) & (width >= min_width)
    return DipQualification(
        qualified=qualified, is_peak=is_peak, prominence=prominence, width=width
    )


def batched_dip_qualification(
    spectra: jax.Array,
    min_prominence: float = 1.0,
    min_width: float = 1.0,
    use_pallas: bool | None = None,
    interpret: bool = False,
    tile: int = 8,
) -> DipQualification:
    """(B, N) spectra -> batched DipQualification (all fields (B, N)).

    On TPU (or with `interpret=True`) the lattice math runs inside a
    Pallas kernel, one batch tile per grid step, so the (tile, N, N)
    intermediates live in VMEM instead of round-tripping HBM — measured
    146 ms -> ~9 ms per 8192-spectrum chunk on v5e (the peak analysis
    dominated 1e6-candidate screening).  Off-TPU it is a plain vmap of
    `dip_qualification`.  Results are identical (tested).

    The kernel pads N up to a lane multiple with t=-inf columns (x=+inf
    sentinels qualify for no predicate and preserve the signal-endpoint
    exclusion) and pads B up to the tile size; pads are sliced away.
    """
    if use_pallas is None:
        use_pallas = interpret or jax.default_backend() == "tpu"
    if not use_pallas:
        # CPU/GPU: the sparse-table form — ~16x the dense lattice on CPU
        # (dense measured 1.6 s per 1024 spectra there)
        return jax.vmap(
            lambda t: _dip_qualification_lifted(t, min_prominence, min_width)
        )(spectra)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = spectra.shape
    n_pad = -(-n // 128) * 128
    b_pad = -(-B // tile) * tile
    t_padded = jnp.pad(
        spectra, ((0, b_pad - B), (0, n_pad - n)),
        constant_values=-jnp.inf,
    )

    def kernel(t_ref, qual_ref, peak_ref, prom_ref, width_ref):
        t_block = t_ref[...]
        q = jax.vmap(
            lambda row: dip_qualification(
                row, min_prominence, min_width, _mosaic_safe=True
            )
        )(t_block)
        qual_ref[...] = q.qualified.astype(jnp.float32)
        peak_ref[...] = q.is_peak.astype(jnp.float32)
        prom_ref[...] = q.prominence
        width_ref[...] = q.width

    block = lambda: pl.BlockSpec(  # noqa: E731
        (tile, n_pad), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // tile,),
        in_specs=[block()],
        out_specs=[block() for _ in range(4)],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, n_pad), jnp.float32)
            for _ in range(4)
        ],
        interpret=interpret,
        **({} if interpret else dict(
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20,
            ))),
    )(t_padded)
    qual, peak, prom, width = (o[:B, :n] for o in out)
    return DipQualification(
        qualified=qual > 0.5,
        is_peak=peak > 0.5,
        prominence=prom,
        width=width,
    )


def find_two_dips(
    t: jax.Array,
    min_prominence: float = 1.0,
    freq: jax.Array | None = None,
    centers: tuple[jax.Array, jax.Array] | None = None,
    min_width: float = 1.0,
    qualified: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Indices of the two reference dips among scipy-qualified candidates.

    Returns `(i1, i2, has1, has2)`.  With `centers=(c1, c2)` (and `freq`),
    dip 1 is the qualified dip closest to c1 and dip 2 the closest to c2
    among the rest — the reference's selection (`data_loader.py:91-105`);
    per-sample NaN centres fall back to depth selection, enabling batched
    mixed use.  Without centres, the two deepest qualified dips are
    returned in frequency order.  `has1`/`has2` report whether enough
    qualified dips exist; when False the paired index is a placeholder.
    """
    n = t.shape[0]
    iota = jnp.arange(n)
    qual = (
        qualified
        if qualified is not None
        else dip_qualification(t, min_prominence, min_width).qualified
    )

    # depth selection: deepest qualified dip, then deepest of the rest
    depth1 = jnp.where(qual, t, jnp.inf)
    d1 = jnp.argmin(depth1)
    has1 = jnp.isfinite(depth1[d1])
    depth2 = jnp.where(qual & (iota != d1), t, jnp.inf)
    d2 = jnp.argmin(depth2)
    has2 = has1 & jnp.isfinite(depth2[d2])
    # frequency order (repo convention when no centres constrain roles)
    d_lo = jnp.minimum(d1, d2)
    d_hi = jnp.maximum(d1, d2)
    d1o = jnp.where(has2, d_lo, d1)
    d2o = jnp.where(has2, d_hi, d1)

    if centers is None or freq is None:
        return d1o, d2o, has1, has2

    c1, c2 = centers
    use_centers = jnp.isfinite(c1) & jnp.isfinite(c2)
    dist1 = jnp.where(qual, jnp.abs(freq - c1), jnp.inf)
    i1c = jnp.argmin(dist1)
    dist2 = jnp.where(qual & (iota != i1c), jnp.abs(freq - c2), jnp.inf)
    i2c = jnp.argmin(dist2)
    has2c = has1 & jnp.isfinite(dist2[i2c])

    i1 = jnp.where(use_centers, i1c, d1o)
    i2 = jnp.where(use_centers, i2c, d2o)
    has2 = jnp.where(use_centers, has2c, has2)
    i2 = jnp.where(has2, i2, i1)
    return i1, i2, has1, has2


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
    qualified: jax.Array | None = None,
) -> jax.Array:
    """All 8 reference metrics for one spectrum: (f1,f2,Q1,FoM1,S1,Q2,FoM2,S2).

    The supplied expected centre frequencies serve double duty exactly as in
    the reference generator: dip selection prefers the qualified dip closest
    to each centre (`data_loader.py:93,102`), and f falls back to the centre
    when no dip qualifies (`data_loader.py:108-109`); Q/FoM/S stay NaN then.
    """
    fb1 = jnp.asarray(jnp.nan if fallback_f1 is None else fallback_f1, t.dtype)
    fb2 = jnp.asarray(jnp.nan if fallback_f2 is None else fallback_f2, t.dtype)
    i1, i2, has1, has2 = find_two_dips(
        t, min_prominence=min_prominence, freq=freq, centers=(fb1, fb2),
        qualified=qualified,
    )
    p1 = peak_parameters(freq, t, i1)
    p2 = peak_parameters(freq, t, i2)

    f1 = jnp.where(has1, p1.f_res, jnp.nan)
    q1 = jnp.where(has1, p1.q, jnp.nan)
    fom1 = jnp.where(has1, p1.fom, jnp.nan)
    f2 = jnp.where(has2, p2.f_res, jnp.nan)
    q2 = jnp.where(has2, p2.q, jnp.nan)
    fom2 = jnp.where(has2, p2.fom, jnp.nan)

    f1 = jnp.where(jnp.isnan(f1), fb1, f1)
    f2 = jnp.where(jnp.isnan(f2), fb2, f2)

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
    """(B, N) spectra -> (B, 8) metrics, fully on-device.

    The O(N²)-per-spectrum dip qualification runs once for the whole
    batch through `batched_dip_qualification` (Pallas on TPU — the
    lattice stays in VMEM); selection/FWHM are cheap O(N) vmapped ops."""
    qual = batched_dip_qualification(
        spectra, min_prominence=min_prominence
    ).qualified
    fn = lambda t, fb1, fb2, q: spectrum_metrics(
        freq, t, fb1, fb2, min_prominence=min_prominence, qualified=q
    )
    if fallback_f1 is None:
        fallback_f1 = jnp.full(spectra.shape[0], jnp.nan)
    if fallback_f2 is None:
        fallback_f2 = jnp.full(spectra.shape[0], jnp.nan)
    return jax.vmap(fn)(spectra, fallback_f1, fallback_f2, qual)
