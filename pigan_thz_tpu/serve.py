"""Model serving: in-process batch inference + StableHLO export.

Production deployment path the reference lacks entirely: the trained
generator / forward-surrogate / full inverse-design cycle are serialized as
self-contained StableHLO functions (weights baked in), loadable by any
process with jax.export — no flax, no model code, no Python class — and
runnable on CPU/GPU/TPU servers.

    export_inverse_design(g, f, g_vars, f_vars, ds, "designer.stablehlo",
                          batch_size=64)
    fn = load_exported("designer.stablehlo")
    params_phys, recon_spec, metrics = fn(spectra)   # (64, 250) -> ...

Measured serving performance (v5e-1, device-side stream of 32 DISTINCT
batches per timing — host-driven microbenchmarks through the TPU relay are
unreliable; see RESULTS.md "Serving measurements"):

    full cycle            B=8192          B=65536
    XLA fp32              1.36 ms         5.99 ms  (11.0 M spectra/s)
    Pallas fused fp32     1.51 ms         6.04 ms
    XLA bf16              1.12 ms         2.87 ms  (22.9 M spectra/s)

XLA fp32 already runs at ~36 TF/s (near the fp32 roofline) for this chain,
so the Pallas path is kept as a numerics-verified OPTION (``use_pallas``)
but is not the default; ``compute_dtype=jnp.bfloat16`` is the measured
serving win (2.06x at large batch, parameter error < 0.005 on [-1,1]
outputs).  Pallas artifacts export for the 'tpu' platform only (Mosaic
custom calls); the portable multi-platform export keeps the XLA path.
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
_TPU_ONLY = ("tpu",)


def _platforms(use_pallas: bool):
    return _TPU_ONLY if use_pallas else _PLATFORMS


def make_inverse_design_fn(
    generator, forward_model, g_variables, f_variables, ds: ThzDataset,
    use_pallas: bool = False, pallas_interpret: bool = False,
    compute_dtype=None,
):
    """Jitted in-process serving callable:
    spectra (B, S) -> (params_phys (B, 4), recon_spectrum (B, S), metrics).

    ``compute_dtype=jnp.bfloat16`` runs activations/matmuls in bf16 on the
    MXU with fp32 params and fp32 outputs — the measured serving win
    (2.06x at B=65536 on v5e-1; see module docstring).
    ``use_pallas=True`` routes both models through the fused VMEM kernels
    instead (numerics-verified alternative; measured at parity with XLA —
    baseline MLP trio only, ops/pallas_kernels.py validates the layout)."""
    if use_pallas and compute_dtype is not None:
        raise ValueError(
            "use_pallas and compute_dtype are mutually exclusive "
            "(the fused kernels run fp32)"
        )
    if use_pallas:
        from .ops.pallas_kernels import forward_surrogate_fused, generator_fused

        @jax.jit
        def fn(spectra):
            pn = generator_fused(g_variables, spectra, interpret=pallas_interpret)
            spec, met = forward_surrogate_fused(
                f_variables, pn, spectrum_dim=ds.spectrum_dim,
                interpret=pallas_interpret,
            )
            return denormalize_params(pn, ds.param_lo, ds.param_hi), spec, met

        return fn

    if compute_dtype == "int8" or compute_dtype is jnp.int8:
        # Post-training int8 quantization (ops/quantized.py): weight scales
        # and BN folding happen here, once; the jitted program runs int8
        # MXU matmuls with fp32 norm/activation math between them.
        from .ops.quantized import make_int8_cycle_fn

        cycle = make_int8_cycle_fn(g_variables, f_variables, ds.spectrum_dim)

        @jax.jit
        def fn(spectra):
            pn, spec, met = cycle(spectra)
            return denormalize_params(pn, ds.param_lo, ds.param_hi), spec, met

        return fn

    if compute_dtype is not None:
        # flax dtype attrs cascade from the top-level module into every block
        generator = generator.clone(dtype=compute_dtype)
        forward_model = forward_model.clone(dtype=compute_dtype)

    @jax.jit
    def fn(spectra):
        pn = generator.apply(g_variables, spectra, train=False)
        out = forward_model.apply(f_variables, pn, train=False)
        pn32 = pn.astype(jnp.float32)
        return (
            denormalize_params(pn32, ds.param_lo, ds.param_hi),
            out[0].astype(jnp.float32),
            out[1].astype(jnp.float32),
        )

    return fn


def _save(exported, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(exported.serialize())
    return path


def export_generator(
    generator, g_variables, ds: ThzDataset, path: str, batch_size: int = 64,
    compute_dtype=None,
) -> str:
    """spectrum (B, S) -> physical params (B, 4).

    ``compute_dtype=jnp.bfloat16`` bakes the bf16 activation/matmul path
    (fp32 params and outputs) into the artifact, like the designer export."""
    if compute_dtype is not None:
        generator = generator.clone(dtype=compute_dtype)

    def fn(spectra):
        pn = generator.apply(g_variables, spectra, train=False)
        return denormalize_params(
            pn.astype(jnp.float32), ds.param_lo, ds.param_hi
        )

    spec = jax.ShapeDtypeStruct((batch_size, ds.spectrum_dim), jnp.float32)
    return _save(jex.export(jax.jit(fn), platforms=_PLATFORMS)(spec), path)


def export_forward_surrogate(
    forward_model, f_variables, ds: ThzDataset, path: str, batch_size: int = 64,
    use_pallas: bool = False, compute_dtype=None,
) -> str:
    """normalized params (B, 4) -> (spectrum (B, S), metrics (B, 8)).

    ``use_pallas=True`` bakes the fused VMEM kernel into a TPU-only
    artifact (numerics-verified alternative; measured at PARITY with the
    XLA path — the earlier 2.5x "isolated win" was a host-driven
    measurement artifact, see the module docstring);
    ``compute_dtype="int8"`` bakes the post-training-quantized chain
    (ops/quantized.py) into a ~4x smaller portable artifact; any other
    ``compute_dtype`` (e.g. jnp.bfloat16) cascades into the module's
    dtype like the designer export."""
    if use_pallas and compute_dtype is not None:
        raise ValueError(
            "use_pallas and compute_dtype are mutually exclusive "
            "(the fused kernel runs fp32)"
        )
    if compute_dtype == "int8" or compute_dtype is jnp.int8:
        from .ops.quantized import int8_forward_apply, quantize_forward

        qf = quantize_forward(f_variables)

        def fn(params_norm):
            return int8_forward_apply(qf, params_norm, ds.spectrum_dim)

    elif use_pallas:
        from .ops.pallas_kernels import forward_surrogate_fused

        def fn(params_norm):
            return forward_surrogate_fused(
                f_variables, params_norm, spectrum_dim=ds.spectrum_dim
            )

    else:
        if compute_dtype is not None:
            # previously every non-int8 dtype was SILENTLY ignored and an
            # fp32 artifact shipped (review r4) — bake it like the
            # designer export does
            forward_model = forward_model.clone(dtype=compute_dtype)

        def fn(params_norm):
            out = forward_model.apply(f_variables, params_norm, train=False)
            return out[0].astype(jnp.float32), out[1].astype(jnp.float32)

    spec = jax.ShapeDtypeStruct((batch_size, ds.params_norm.shape[1]), jnp.float32)
    return _save(
        jex.export(jax.jit(fn), platforms=_platforms(use_pallas))(spec), path
    )


def export_inverse_design(
    generator, forward_model, g_variables, f_variables, ds: ThzDataset,
    path: str, batch_size: int = 64, use_pallas: bool = False,
    compute_dtype=None,
) -> str:
    """Full cycle: spectrum -> params (physical) + surrogate verification.

    ``compute_dtype=jnp.bfloat16`` bakes the bf16 serving path into the
    artifact (2.06x measured at B=65536 on v5e-1); ``use_pallas=True`` ->
    TPU-only artifact on the fused-kernel path."""
    fn = make_inverse_design_fn(
        generator, forward_model, g_variables, f_variables, ds,
        use_pallas=use_pallas, compute_dtype=compute_dtype,
    )
    spec = jax.ShapeDtypeStruct((batch_size, ds.spectrum_dim), jnp.float32)
    return _save(jex.export(fn, platforms=_platforms(use_pallas))(spec), path)


def make_ensemble_inverse_design_fn(
    generator, forward_model, g_variables_stacked, f_variables,
    ds: ThzDataset, compute_dtype=None,
):
    """Ensemble-MEAN serving: spectra (B, S) -> (params_phys, recon, metrics).

    The measured best held-out predictor is the mean of N seed-ensemble
    members' normalized predictions (0.9806 vs 0.9752 for the best single
    member — RESULTS.md "Seed-search quality"; `parallel/ensemble.py
    evaluate_ensemble_mean` is the scoring twin of this serving path).
    ``g_variables_stacked`` carries a leading member axis on every leaf
    (the layout `examples/seed_search.py --save-best` persists as
    ``ensemble_best``); the member forward passes run as one vmap — N
    small matmul chains batched on-device, not N dispatches."""
    if compute_dtype is not None:
        generator = generator.clone(dtype=compute_dtype)
        forward_model = forward_model.clone(dtype=compute_dtype)

    @jax.jit
    def fn(spectra):
        preds = jax.vmap(
            lambda gv: generator.apply(gv, spectra, train=False)
        )(g_variables_stacked)                     # (N, B, 4)
        mean_norm = jnp.mean(preds.astype(jnp.float32), axis=0)
        out = forward_model.apply(f_variables, mean_norm, train=False)
        return (
            denormalize_params(mean_norm, ds.param_lo, ds.param_hi),
            out[0].astype(jnp.float32),
            out[1].astype(jnp.float32),
        )

    return fn


def export_ensemble_inverse_design(
    generator, forward_model, g_variables_stacked, f_variables,
    ds: ThzDataset, path: str, batch_size: int = 64, compute_dtype=None,
) -> str:
    """StableHLO artifact of the ensemble-mean cycle (weights baked in,
    every platform) — makes the best-quality predictor deployable, not
    just scorable."""
    fn = make_ensemble_inverse_design_fn(
        generator, forward_model, g_variables_stacked, f_variables, ds,
        compute_dtype=compute_dtype,
    )
    spec = jax.ShapeDtypeStruct((batch_size, ds.spectrum_dim), jnp.float32)
    return _save(jex.export(fn, platforms=_PLATFORMS)(spec), path)


def load_exported(path: str):
    """Returns a callable running the exported StableHLO function."""
    with open(path, "rb") as fh:
        exported = jex.deserialize(fh.read())

    def call(*args):
        return exported.call(*args)

    return call
