"""Large-scale inverse-design screening.

BASELINE.json config #5: "generate 1e6 candidate (r1,r2,w,g) sets and rank by
surrogate Q/FoM".  The reference has no screening capability at all; this is
a TPU-native addition built from the framework's own parts:

1. sample candidate parameters uniformly in the normalized design box;
2. run the frozen forward surrogate in large batches (one (B,4)x(4,1024)
   matmul chain per chunk — pure MXU work);
3. derive physics metrics (f_res, Q, FoM, S) from the PREDICTED spectra with
   the fixed-shape peak analysis (`ops.peaks`) — grounding the ranking in
   spectrum shape rather than trusting the surrogate's metric head;
4. maintain a running top-k via `lax.top_k` inside a `lax.scan` over chunks —
   the full 1e6-candidate screen never leaves the device.

`screen_designs` returns physical-unit parameters with their scores; chunked
scanning keeps peak VMEM/HBM use independent of the total candidate count.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..data.dataset import denormalize_params
from ..ops.peaks import batched_peak_metrics

# metric layout from ops.peaks.spectrum_metrics == config.METRIC_NAMES order
from ..config import METRIC_NAMES

METRIC_INDEX = {name: i for i, name in enumerate(METRIC_NAMES)}


class ScreeningResult(NamedTuple):
    params: jax.Array        # (top_k, 4) physical units
    scores: jax.Array        # (top_k,)
    metrics: jax.Array       # (top_k, 8) spectrum-derived metrics
    spectra: jax.Array       # (top_k, S) predicted spectra of the winners
    valid: jax.Array         # (top_k,) bool: score > -inf (False rows are
    # zero-init filler when fewer than top_k candidates scored — e.g. a
    # strict min_prominence leaving every peak masked)


@dataclass(frozen=True)
class ScreeningConfig:
    num_candidates: int = 1_000_000
    chunk_size: int = 8192
    top_k: int = 100
    objective: str = "FoM1"      # any METRIC_INDEX key or "FoM1+FoM2"
    min_prominence: float = 1.0
    # Use the Pallas fused-MLP kernel for the surrogate (baseline ForwardMLP
    # only).  Measured per-chunk at 8192 on v5e-1: 1.78 ms Pallas vs 1.76 ms
    # XLA — the chunk is dominated by the peak-analysis VPU work, so this is
    # a numerics-verified option, not a speedup (RESULTS.md "Serving
    # measurements"); the XLA default stands.
    use_pallas: bool = False
    # "bfloat16" runs the surrogate forward pass in bf16 (module compute
    # dtype + variables cast once; predictions back in fp32 for the peak
    # analysis) — the serving fast path's dtype, offered for parity with
    # `export --dtype`.  Measured end-to-end on v5e-1: ~NEUTRAL (19.4 s
    # bf16 vs 18.7 s fp32 per 1e6, same session): unlike serving's 2.06x,
    # the screening chunk is dominated by the Pallas peak analysis, not
    # the surrogate matmuls.  Rankings can differ near score ties (top
    # FoM1 moved ~6e-3 relative).  fp32 default keeps exact-rank parity.
    compute_dtype: str = "float32"


def _score(metrics: jax.Array, objective: str) -> jax.Array:
    """NaN-safe objective: missing peaks score -inf."""
    def one(name):
        v = metrics[:, METRIC_INDEX[name]]
        return jnp.where(jnp.isnan(v), -jnp.inf, v)

    if "+" in objective:
        parts = objective.split("+")
        return sum(one(p) for p in parts)
    return one(objective)


def screen_designs(
    forward_model,
    f_variables,
    frequencies: jax.Array,
    param_lo: jax.Array,
    param_hi: jax.Array,
    key: jax.Array,
    cfg: ScreeningConfig = ScreeningConfig(),
    mesh=None,
) -> ScreeningResult:
    """Run the full screen on device; returns the global top-k designs.

    With `mesh`, each chunk's candidate batch is sharded over the data axis
    (surrogate weights replicated) — on a v5e-8 slice the same program
    screens 8 chunks' worth of candidates per step, with only the final
    top-k reduction crossing chips (BASELINE config #5)."""
    n_chunks = -(-cfg.num_candidates // cfg.chunk_size)
    spectrum_dim = frequencies.shape[0]
    if cfg.compute_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"compute_dtype {cfg.compute_dtype!r}: use float32 | bfloat16"
        )
    if cfg.compute_dtype == "bfloat16":
        if cfg.use_pallas:
            raise ValueError("use_pallas supports float32 only")
        # serve.py's clone(dtype=...) mechanism sets the compute dtype;
        # screening ALSO pre-casts the variables once, because its apply
        # sits inside a lax.scan — with fp32 params the fp32->bf16 weight
        # cast re-runs every chunk iteration (measured +80 ms/chunk,
        # turning the bf16 mode into a net slowdown)
        forward_model = forward_model.clone(dtype=jnp.bfloat16)
        f_variables = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x,
            f_variables,
        )
    batch_constraint = None
    if mesh is not None and cfg.use_pallas:
        raise ValueError(
            "use_pallas and mesh sharding are mutually exclusive: pallas_call "
            "has no SPMD partitioning rule for the sharded candidate batch"
        )
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        batch_constraint = NamedSharding(mesh, P(DATA_AXIS))

    @partial(jax.jit, static_argnums=())
    def run(key):
        def chunk(carry, xs):
            k, n_valid = xs
            top_scores, top_params, top_metrics, top_spectra = carry
            params_norm = jax.random.uniform(
                k, (cfg.chunk_size, param_lo.shape[0]), minval=-1.0, maxval=1.0
            )
            if batch_constraint is not None:
                params_norm = jax.lax.with_sharding_constraint(
                    params_norm, batch_constraint
                )
            if cfg.use_pallas:
                from ..ops.pallas_kernels import forward_surrogate_fused

                pred_spec, _ = forward_surrogate_fused(
                    f_variables, params_norm, spectrum_dim=spectrum_dim
                )
            else:
                out = forward_model.apply(f_variables, params_norm, train=False)
                pred_spec = out[0].astype(jnp.float32)
            metrics = batched_peak_metrics(
                frequencies, pred_spec, min_prominence=cfg.min_prominence
            )
            scores = _score(metrics, cfg.objective)
            # NaN scores (e.g. a ±inf-mixing composite objective) must sort
            # last — lax.top_k can otherwise rank NaN above finite scores,
            # truncating genuinely valid candidates from the output
            scores = jnp.where(jnp.isnan(scores), -jnp.inf, scores)
            # ceil-divide chunking: rows past num_candidates in the final
            # chunk are padding, not extra free screening — mask them out
            # so exactly num_candidates candidates compete
            scores = jnp.where(
                jnp.arange(cfg.chunk_size) < n_valid, scores, -jnp.inf
            )

            all_scores = jnp.concatenate([top_scores, scores])
            best, idx = jax.lax.top_k(all_scores, cfg.top_k)
            all_params = jnp.concatenate([top_params, params_norm])
            all_metrics = jnp.concatenate([top_metrics, metrics])
            all_spectra = jnp.concatenate([top_spectra, pred_spec])
            return (
                best, all_params[idx], all_metrics[idx], all_spectra[idx]
            ), None

        init = (
            jnp.full((cfg.top_k,), -jnp.inf),
            jnp.zeros((cfg.top_k, param_lo.shape[0])),
            jnp.zeros((cfg.top_k, 8)),
            jnp.zeros((cfg.top_k, spectrum_dim)),
        )
        keys = jax.random.split(key, n_chunks)
        counts = jnp.clip(
            cfg.num_candidates - jnp.arange(n_chunks) * cfg.chunk_size,
            0, cfg.chunk_size,
        )
        (scores, params_norm, metrics, spectra), _ = jax.lax.scan(
            chunk, init, (keys, counts)
        )
        params_phys = denormalize_params(params_norm, param_lo, param_hi)
        return ScreeningResult(
            params=params_phys, scores=scores, metrics=metrics,
            spectra=spectra, valid=scores > -jnp.inf,
        )

    return run(key)


def screening_throughput(num_candidates: int, seconds: float) -> float:
    return num_candidates / seconds
