"""Model export for serving: StableHLO artifacts via jax.export.

Production deployment path the reference lacks entirely: the trained
generator / forward-surrogate / full inverse-design cycle are serialized as
self-contained StableHLO functions (weights baked in), loadable by any
process with jax.export — no flax, no model code, no Python class — and
runnable on CPU/GPU/TPU servers.

    export_inverse_design(g, f, g_vars, f_vars, ds, "designer.stablehlo",
                          batch_size=64)
    fn = load_exported("designer.stablehlo")
    params_phys, recon_spec, metrics = fn(spectra)   # (64, 250) -> ...
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import export as jex

from .data.dataset import ThzDataset, denormalize_params


# Export for every major backend so the artifact is deployable anywhere,
# not just on the exporting machine's platform.
_PLATFORMS = ("cpu", "cuda", "tpu")


def _save(exported, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(exported.serialize())
    return path


def export_generator(
    generator, g_variables, ds: ThzDataset, path: str, batch_size: int = 64
) -> str:
    """spectrum (B, S) -> physical params (B, 4)."""

    def fn(spectra):
        pn = generator.apply(g_variables, spectra, train=False)
        return denormalize_params(pn, ds.param_lo, ds.param_hi)

    spec = jax.ShapeDtypeStruct((batch_size, ds.spectrum_dim), jnp.float32)
    return _save(jex.export(jax.jit(fn), platforms=_PLATFORMS)(spec), path)


def export_forward_surrogate(
    forward_model, f_variables, ds: ThzDataset, path: str, batch_size: int = 64
) -> str:
    """normalized params (B, 4) -> (spectrum (B, S), metrics (B, 8))."""

    def fn(params_norm):
        out = forward_model.apply(f_variables, params_norm, train=False)
        return out[0], out[1]

    spec = jax.ShapeDtypeStruct((batch_size, ds.params_norm.shape[1]), jnp.float32)
    return _save(jex.export(jax.jit(fn), platforms=_PLATFORMS)(spec), path)


def export_inverse_design(
    generator, forward_model, g_variables, f_variables, ds: ThzDataset,
    path: str, batch_size: int = 64,
) -> str:
    """Full cycle: spectrum -> params (physical) + surrogate verification."""

    def fn(spectra):
        pn = generator.apply(g_variables, spectra, train=False)
        out = forward_model.apply(f_variables, pn, train=False)
        return denormalize_params(pn, ds.param_lo, ds.param_hi), out[0], out[1]

    spec = jax.ShapeDtypeStruct((batch_size, ds.spectrum_dim), jnp.float32)
    return _save(jex.export(jax.jit(fn), platforms=_PLATFORMS)(spec), path)


def load_exported(path: str):
    """Returns a callable running the exported StableHLO function."""
    with open(path, "rb") as fh:
        exported = jex.deserialize(fh.read())

    def call(*args):
        return exported.call(*args)

    return call
