"""Device-resident dataset and de/normalization for THz metamaterial data.

Reference behaviour being reproduced (file:line under /root/reference):
- CSV schema: `Freq_x.xx` spectrum columns auto-discovered and sorted by
  frequency, param columns r1,r2,w,g, metric columns f1..S2
  (core/utils/data_loader.py:135-176);
- params normalized to [0,1] via hardcoded ranges then to [-1,1] for the GAN
  (data_loader.py:185-194);
- metrics min-max normalized to [0,1] with per-column ranges computed from the
  *valid* (non-NaN) entries, then NaN -> 0.5 (data_loader.py:198-219);
- denormalize_params maps [-1,1] -> physical (data_loader.py:238-252);
- denormalize_metrics maps [0,1] -> physical with NaN -> 0.0
  (data_loader.py:255-293);
- normalize_spectrum min-max -> [0,1], clamped (data_loader.py:298-329).

TPU-native design: instead of a PyTorch ``Dataset`` + multiprocess
``DataLoader`` (data_loader.py:115-234, config.py:19), the full dataset
(1000 x 250 floats ≈ 1 MB) lives as device arrays.  Minibatching is an
index-gather under ``jit`` — the whole epoch runs as one `lax.scan` with zero
host↔device transfers (see pigan_thz_tpu.train.steps).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DataConfig, METRIC_NAMES, PARAM_NAMES
from .synthetic import SyntheticBatch, generate_dataset

# ---------------------------------------------------------------------------
# Pure normalization functions
# ---------------------------------------------------------------------------


def normalize_params(params: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Physical -> [-1, 1] (data_loader.py:185-194)."""
    span = hi - lo
    unit = jnp.where(span > 1e-6, (params - lo) / jnp.where(span > 1e-6, span, 1.0), 0.5)
    return unit * 2.0 - 1.0


def denormalize_params(params_norm: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """[-1, 1] -> physical (data_loader.py:238-252)."""
    unit = (params_norm + 1.0) / 2.0
    return unit * (hi - lo) + lo


def metric_ranges_from_data(metrics: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-column (min, max) over non-NaN entries; (0, 1) if all-NaN
    (data_loader.py:200-211)."""
    valid = ~jnp.isnan(metrics)
    any_valid = jnp.any(valid, axis=0)
    lo = jnp.min(jnp.where(valid, metrics, jnp.inf), axis=0)
    hi = jnp.max(jnp.where(valid, metrics, -jnp.inf), axis=0)
    lo = jnp.where(any_valid, lo, 0.0)
    hi = jnp.where(any_valid, hi, 1.0)
    return lo, hi


def normalize_metrics(metrics: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Physical -> [0, 1]; zero-span columns -> 0.5; NaN -> 0.5
    (data_loader.py:213-219)."""
    span = hi - lo
    unit = jnp.where(span > 1e-6, (metrics - lo) / jnp.where(span > 1e-6, span, 1.0), 0.5)
    return jnp.where(jnp.isnan(unit), 0.5, unit)


def denormalize_metrics(metrics_norm: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """[0, 1] -> physical; zero-span -> lo; NaN -> 0.0 (data_loader.py:255-293)."""
    span = hi - lo
    out = jnp.where(span > 1e-6, metrics_norm * span + lo, lo)
    return jnp.where(jnp.isnan(out), 0.0, out)


def normalize_spectrum(
    spectrum: jax.Array,
    global_min: float | jax.Array | None = None,
    global_max: float | jax.Array | None = None,
) -> jax.Array:
    """Min-max -> [0,1] clamped (data_loader.py:298-329)."""
    lo = jnp.min(spectrum) if global_min is None else jnp.asarray(global_min)
    hi = jnp.max(spectrum) if global_max is None else jnp.asarray(global_max)
    span = hi - lo
    out = jnp.where(span > 1e-8, (spectrum - lo) / jnp.where(span > 1e-8, span, 1.0), 0.5)
    return jnp.clip(out, 0.0, 1.0)


# ---------------------------------------------------------------------------
# Device-resident dataset
# ---------------------------------------------------------------------------


class ThzDataset(NamedTuple):
    """All arrays device-resident; the NamedTuple is a pytree so the whole
    dataset can be donated to jitted epoch loops or sharded over a mesh.

    Mirrors the 5-tuple yielded by MetamaterialDataset.__getitem__
    (data_loader.py:227-234) plus the normalization statistics that the
    reference keeps as Python dict attributes (param_ranges, metric_ranges).
    """

    spectra: jax.Array           # (N, S) raw dB spectra
    params: jax.Array            # (N, 4) physical units
    params_norm: jax.Array       # (N, 4) in [-1, 1]
    metrics: jax.Array           # (N, 8) physical units (may contain NaN)
    metrics_norm: jax.Array      # (N, 8) in [0, 1], NaN -> 0.5
    param_lo: jax.Array          # (4,)
    param_hi: jax.Array          # (4,)
    metric_lo: jax.Array         # (8,)
    metric_hi: jax.Array         # (8,)
    frequencies: jax.Array       # (S,)

    @property
    def num_samples(self) -> int:
        return self.spectra.shape[0]

    @property
    def spectrum_dim(self) -> int:
        return self.spectra.shape[1]


def build_dataset(
    spectra: jax.Array,
    params: jax.Array,
    metrics: jax.Array,
    cfg: DataConfig,
    frequencies: jax.Array | None = None,
) -> ThzDataset:
    """`frequencies` overrides the config linspace — CSV loaders pass the
    actual Freq_* header values so peak analysis works on any grid."""
    lo = jnp.full((cfg.param_dim,), cfg.param_min, dtype=jnp.float32)
    hi = jnp.full((cfg.param_dim,), cfg.param_max, dtype=jnp.float32)
    mlo, mhi = metric_ranges_from_data(metrics)
    freq = (
        jnp.asarray(frequencies, jnp.float32)
        if frequencies is not None
        else cfg.frequencies
    )
    return ThzDataset(
        spectra=jnp.asarray(spectra, jnp.float32),
        params=jnp.asarray(params, jnp.float32),
        params_norm=normalize_params(jnp.asarray(params, jnp.float32), lo, hi),
        metrics=jnp.asarray(metrics, jnp.float32),
        metrics_norm=normalize_metrics(jnp.asarray(metrics, jnp.float32), mlo, mhi),
        param_lo=lo,
        param_hi=hi,
        metric_lo=mlo,
        metric_hi=mhi,
        frequencies=freq,
    )


def synthetic_dataset(cfg: DataConfig, key: jax.Array | None = None) -> ThzDataset:
    """Self-sufficient dataset path: generate on device, then normalize."""
    if key is None:
        key = jax.random.PRNGKey(cfg.seed)
    raw: SyntheticBatch = generate_dataset(key, cfg.num_samples, cfg)
    return build_dataset(raw.spectra, raw.params, raw.metrics, cfg)


# ---------------------------------------------------------------------------
# CSV interop (host-side; matches the reference schema)
# ---------------------------------------------------------------------------


def discover_spectrum_schema(header) -> tuple:
    """Freq_* column discovery + required-column validation — the ONE
    source of truth shared by the pandas loader, the native C++ loader,
    and the metadata-only loader, so the three can never desynchronize
    (the bit-identical-loader property the CSV robustness tests protect).
    Returns (sorted spec_cols, frequencies float32 array)."""
    cols = list(header)
    spec_cols = [
        c for c in cols
        if c.startswith("Freq_")
        and c.split("_", 1)[1].replace(".", "", 1).isdigit()
    ]
    if not spec_cols:
        raise ValueError("no 'Freq_*' spectrum columns found in CSV")
    spec_cols = sorted(spec_cols, key=lambda c: float(c.split("_", 1)[1]))
    present = set(cols)
    missing = [c for c in (*PARAM_NAMES, *METRIC_NAMES) if c not in present]
    if missing:
        raise ValueError(f"CSV missing required columns: {missing}")
    freqs = np.array(
        [float(c.split("_", 1)[1]) for c in spec_cols], np.float32
    )
    return spec_cols, freqs


def _spectrum_columns(freqs: np.ndarray) -> list[str]:
    """Reference format is 2 decimals (data_loader.py:135); raise precision
    automatically when a finer grid would produce duplicate labels."""
    for decimals in range(2, 8):
        cols = [f"Freq_{f:.{decimals}f}" for f in freqs]
        if len(set(cols)) == len(cols):
            return cols
    raise ValueError("cannot produce unique Freq_* labels for this grid")


def load_csv(path: str, cfg: DataConfig) -> ThzDataset:
    """Load the reference CSV schema (data_loader.py:149-181).

    Spectrum columns are auto-discovered by the `Freq_` prefix and sorted by
    their numeric frequency; param/metric columns are required by name.
    """
    import pandas as pd

    if not os.path.exists(path):
        raise FileNotFoundError(f"dataset not found: {path}")
    df = pd.read_csv(path)

    spec_cols, freqs = discover_spectrum_schema(df.columns)
    if len(spec_cols) != cfg.spectrum_dim:
        cfg = DataConfig(
            **{**cfg.__dict__, "spectrum_dim": len(spec_cols)}
        )

    spectra = df[spec_cols].to_numpy(dtype=np.float32)
    params = df[list(PARAM_NAMES)].to_numpy(dtype=np.float32)
    metrics = df[list(METRIC_NAMES)].to_numpy(dtype=np.float32)
    return build_dataset(spectra, params, metrics, cfg, frequencies=freqs)


def save_csv(ds: ThzDataset, path: str) -> None:
    """Write a dataset in the reference CSV schema (round-trips load_csv)."""
    import pandas as pd

    freqs = np.asarray(ds.frequencies)
    data = {}
    params = np.asarray(ds.params)
    for i, name in enumerate(PARAM_NAMES):
        data[name] = params[:, i]
    spectra = np.asarray(ds.spectra)
    for j, col in enumerate(_spectrum_columns(freqs)):
        data[col] = spectra[:, j]
    metrics = np.asarray(ds.metrics)
    for i, name in enumerate(METRIC_NAMES):
        data[name] = metrics[:, i]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pd.DataFrame(data).to_csv(path, index=False)


class ThzMetadata(NamedTuple):
    """Dataset metadata without the data — the counterpart of the
    reference's ``MetamaterialDataset(load_data=False)`` fixture mode
    (data_loader.py:116-122, which loads only frequencies and column
    names).  From a CSV only the HEADER line is read."""

    frequencies: np.ndarray      # (S,)
    param_names: tuple
    metric_names: tuple
    spectrum_dim: int
    num_samples: int | None      # None when no CSV was given


def load_metadata(cfg: DataConfig, csv_path: str | None = None) -> ThzMetadata:
    """Metadata-only load (reference ``load_data=False`` parity).

    With a CSV path: read the header line, discover/sort the Freq_*
    columns, validate the required param/metric columns, and count data
    rows — without parsing a single float.  Without: derive everything
    from the config (the synthetic path's grid)."""
    if csv_path:
        if not os.path.exists(csv_path):
            raise FileNotFoundError(f"dataset not found: {csv_path}")
        # utf-8-sig + csv.reader so BOM'd / quoted-header files parse the
        # same columns pandas sees in load_csv (Excel exports both)
        import csv as _csv

        with open(csv_path, "r", newline="", encoding="utf-8-sig") as fh:
            reader = _csv.reader(fh)
            header = [c.strip() for c in next(reader, [])]
            # count via the same csv.reader so quoted fields with embedded
            # newlines count as one row, matching pandas' semantics
            n_rows = sum(1 for row in reader if any(c.strip() for c in row))
        spec_cols, freqs = discover_spectrum_schema(header)
        return ThzMetadata(
            frequencies=freqs,
            param_names=tuple(PARAM_NAMES),
            metric_names=tuple(METRIC_NAMES),
            spectrum_dim=len(spec_cols),
            num_samples=n_rows,
        )
    return ThzMetadata(
        frequencies=np.asarray(cfg.frequencies, np.float32),
        param_names=tuple(PARAM_NAMES),
        metric_names=tuple(METRIC_NAMES),
        spectrum_dim=cfg.spectrum_dim,
        num_samples=None,
    )


def load_or_synthesize(cfg: DataConfig, csv_path: str | None = None) -> ThzDataset:
    """Prefer the CSV if it exists (reference workflow); otherwise synthesize
    (the CSV is a missing large blob in the reference repo).  Uses the native
    C++ parser when the extension is buildable, pandas otherwise."""
    if csv_path and os.path.exists(csv_path):
        from .native_io import load_csv_native, native_available

        if native_available():
            return load_csv_native(csv_path, cfg)
        return load_csv(csv_path, cfg)
    return synthetic_dataset(cfg)


def split_dataset(
    ds: ThzDataset, val_frac: float = 0.2, key: jax.Array | None = None
) -> tuple[ThzDataset, ThzDataset]:
    """Shuffled train/validation split (the overlay's validation_split knob,
    training_optimization.py:114 — declared there, never used; the reference
    evaluates on its training CSV).  Normalization statistics stay those of
    the FULL dataset so both splits share the same scales."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n = ds.num_samples
    n_val = max(1, int(round(n * val_frac)))
    perm = jax.random.permutation(key, n)
    val_idx, train_idx = perm[:n_val], perm[n_val:]

    def take(idx):
        return ds._replace(
            spectra=ds.spectra[idx],
            params=ds.params[idx],
            params_norm=ds.params_norm[idx],
            metrics=ds.metrics[idx],
            metrics_norm=ds.metrics_norm[idx],
        )

    return take(train_idx), take(val_idx)


# ---------------------------------------------------------------------------
# Batching (index-shuffled, jit-friendly)
# ---------------------------------------------------------------------------


def epoch_indices(key: jax.Array, num_samples: int, batch_size: int) -> jax.Array:
    """(steps, batch) shuffled index matrix for one epoch.  Drops the ragged
    tail like DataLoader(drop_last=False) does NOT — but with N=1000, bs=64 the
    reference's final short batch contributes <1% of steps; we instead wrap
    around so every step has a full, static batch shape (required for one
    compiled step program)."""
    steps = max(1, num_samples // batch_size)
    perm = jax.random.permutation(key, num_samples)
    needed = steps * batch_size
    if needed > num_samples:
        # tile, not a single concat: num_samples < batch_size/2 needs the
        # permutation repeated several times to fill one static batch
        reps = -(-needed // num_samples)
        perm = jnp.tile(perm, reps)
    return perm[:needed].reshape(steps, batch_size)


def gather_batch(ds: ThzDataset, idx: jax.Array):
    """Gather one minibatch (works under jit/scan)."""
    return (
        ds.spectra[idx],
        ds.params[idx],
        ds.params_norm[idx],
        ds.metrics[idx],
        ds.metrics_norm[idx],
    )
