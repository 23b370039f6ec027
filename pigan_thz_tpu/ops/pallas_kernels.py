"""Pallas TPU kernels: fused MLP-chain forward pass.

The forward surrogate is a 5-block LayerNorm MLP
(4->256->512->1024->512->256->258; reference forward_model.py:28-60).  Its
entire weight set is ~5.5 MB fp32 — it fits in VMEM (~16 MB/core).  The
fused kernel therefore:

- keeps EVERY layer's weights resident in VMEM for the whole grid,
- tiles the batch over the grid (TILE_B rows/step, MXU-aligned),
- runs the full chain (dot -> LayerNorm -> LeakyReLU -> ... -> split head)
  with zero HBM round-trips between layers.

Status after round-2 measurement (RESULTS.md "Serving measurements"): on
device-side streaming benchmarks over DISTINCT batches, the XLA path runs
this chain at ~36 TF/s fp32 — near roofline — and these kernels measure at
parity with it (serving cycle 1.51 vs 1.36 ms at B=8192; screening chunk
1.78 vs 1.76 ms).  Round 1's "1.53x isolated win" was an artifact of
host-driven microbenchmarks through the TPU relay (identical-argument RPCs
are not a sound timing signal there).  The kernels stay as a
numerics-verified alternative path (serve.py / screening `use_pallas`) and
as the repo's reference Pallas implementation; the measured serving win is
bf16 on the XLA path instead (serve.py `compute_dtype`).  Training keeps
the standard XLA path (fusion there is already near-roofline at these
sizes, and the backward pass would need a custom VJP for no measured win).

Numerics match the flax path in fp32 (LayerNorm epsilon 1e-6 = flax default;
LeakyReLU slope 0.2) up to matmul precision ordering.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def extract_forward_mlp_weights(variables: Any, num_blocks: int = 5):
    """Flatten a ForwardMLP variables dict into per-layer (W, b, scale, bias)
    lists plus the head (W, b).  Layout follows models.forward_model.ForwardMLP
    (MLPBlock_i -> Dense_0 + LayerNorm_0, head Dense_0).

    Validates the architecture: enhanced forward models (branched / physics /
    uncertainty) contain extra or differently-named modules whose weights
    would otherwise be silently mis-wired into a wrong chain."""
    p = variables["params"]
    expected = {f"MLPBlock_{i}" for i in range(num_blocks)} | {"Dense_0"}
    actual = set(p.keys())
    if actual != expected:
        raise ValueError(
            "fused kernel supports the baseline ForwardMLP only; got modules "
            f"{sorted(actual)} (expected {sorted(expected)}) — use the XLA "
            "path for enhanced forward models"
        )
    layers = []
    for i in range(num_blocks):
        blk = p[f"MLPBlock_{i}"]
        dense = blk["Dense_0"]
        ln = blk["NormAct_0"]["LayerNorm_0"]
        layers.append((dense["kernel"], dense["bias"], ln["scale"], ln["bias"]))
    head = (p["Dense_0"]["kernel"], p["Dense_0"]["bias"])
    return layers, head


def fused_mlp_forward(
    x: jax.Array,
    layers: Sequence[tuple],
    head: tuple,
    leaky_slope: float = 0.2,
    ln_eps: float = 1e-6,
    tile_b: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused LayerNorm-MLP chain: x (B, D_in) -> (B, D_out).

    layers: [(W, b, ln_scale, ln_bias), ...]; head: (W, b).
    The batch is padded to a multiple of `tile_b`; each grid step computes
    one batch tile through the whole chain in VMEM.
    """
    b, d_in = x.shape
    d_out = head[0].shape[1]
    b_pad = _round_up(max(b, 1), tile_b)
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))

    n_layers = len(layers)
    flat_weights = []
    for W, bb, s, bias in layers:
        flat_weights += [W, bb, s, bias]
    flat_weights += [head[0], head[1]]

    def kernel(x_ref, *refs):
        w_refs = refs[:-1]
        out_ref = refs[-1]
        h = x_ref[:].astype(jnp.float32)
        for i in range(n_layers):
            W = w_refs[4 * i][:]
            bb = w_refs[4 * i + 1][:]
            scale = w_refs[4 * i + 2][:]
            bias = w_refs[4 * i + 3][:]
            h = jnp.dot(h, W, preferred_element_type=jnp.float32) + bb[None, :]
            mean = jnp.mean(h, axis=-1, keepdims=True)
            var = jnp.mean((h - mean) ** 2, axis=-1, keepdims=True)
            h = (h - mean) * jax.lax.rsqrt(var + ln_eps)
            h = h * scale[None, :] + bias[None, :]
            h = jnp.where(h >= 0.0, h, leaky_slope * h)
        W, bb = w_refs[4 * n_layers][:], w_refs[4 * n_layers + 1][:]
        out_ref[:] = jnp.dot(h, W, preferred_element_type=jnp.float32) + bb[None, :]

    grid = (b_pad // tile_b,)
    in_specs = [
        pl.BlockSpec((tile_b, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for w in flat_weights
    ]
    flops = 2 * b_pad * sum(W.shape[0] * W.shape[1] for W, *_ in layers)
    flops += 2 * b_pad * head[0].shape[0] * head[0].shape[1]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile_b, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, d_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(
                4 * (b_pad * d_in + b_pad * d_out)
                + 4 * sum(int(np.prod(w.shape)) for w in flat_weights)
            ),
            transcendentals=b_pad * n_layers,  # rsqrt per row per layer
        ),
        interpret=interpret,
    )(x, *flat_weights)
    return out[:b]


def fold_batchnorm(W, b, scale, bias, mean, var, eps: float = 1e-5):
    """Fold an eval-mode BatchNorm into the preceding Dense:
    BN(xW+b) = (xW+b-mean)/sqrt(var+eps)*scale+bias = x(W*s) + (b-mean)*s+bias
    with s = scale/sqrt(var+eps).  Exact for inference (running stats)."""
    s = scale / jnp.sqrt(var + eps)
    return W * s[None, :], (b - mean) * s + bias


def extract_generator_weights(variables: Any, num_hidden: int = 2):
    """MLPGenerator (Dense->BatchNorm->ReLU blocks + Dense head, tanh) ->
    BatchNorm-folded [(W, b)] chain.  Validates the layout like the forward
    extractor."""
    p = variables["params"]
    stats = variables.get("batch_stats")
    if stats is None:
        raise ValueError("generator variables lack batch_stats (need BN stats)")
    expected = {f"MLPBlock_{i}" for i in range(num_hidden)} | {"Dense_0"}
    if set(p.keys()) != expected:
        raise ValueError(
            f"fused generator supports the baseline MLPGenerator only; got "
            f"{sorted(p.keys())}"
        )
    layers = []
    for i in range(num_hidden):
        blk = p[f"MLPBlock_{i}"]
        dense = blk["Dense_0"]
        bn = blk["NormAct_0"]["BatchNorm_0"]
        bn_stats = stats[f"MLPBlock_{i}"]["NormAct_0"]["BatchNorm_0"]
        W, b = fold_batchnorm(
            dense["kernel"], dense["bias"], bn["scale"], bn["bias"],
            bn_stats["mean"], bn_stats["var"],
        )
        layers.append((W, b))
    head = (p["Dense_0"]["kernel"], p["Dense_0"]["bias"])
    return layers, head


def fused_dense_chain(
    x: jax.Array,
    layers: Sequence[tuple],
    head: tuple,
    hidden_act: str = "relu",
    final_act: str = "tanh",
    tile_b: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Fused plain dense chain (no norm — fold it first): used for the
    generator's serving path.  Same VMEM-resident weight scheme as
    fused_mlp_forward."""
    b, d_in = x.shape
    d_out = head[0].shape[1]
    b_pad = _round_up(max(b, 1), tile_b)
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))

    flat = []
    for W, bb in layers:
        flat += [W, bb]
    flat += [head[0], head[1]]
    n_layers = len(layers)

    def act(h, name):
        if name == "relu":
            return jnp.maximum(h, 0.0)
        if name == "tanh":
            return jnp.tanh(h)
        if name == "leaky_relu":
            return jnp.where(h >= 0.0, h, 0.2 * h)
        return h

    def kernel(x_ref, *refs):
        w_refs = refs[:-1]
        out_ref = refs[-1]
        h = x_ref[:].astype(jnp.float32)
        for i in range(n_layers):
            W = w_refs[2 * i][:]
            bb = w_refs[2 * i + 1][:]
            h = jnp.dot(h, W, preferred_element_type=jnp.float32) + bb[None, :]
            h = act(h, hidden_act)
        W, bb = w_refs[2 * n_layers][:], w_refs[2 * n_layers + 1][:]
        h = jnp.dot(h, W, preferred_element_type=jnp.float32) + bb[None, :]
        out_ref[:] = act(h, final_act)

    grid = (b_pad // tile_b,)
    in_specs = [
        pl.BlockSpec((tile_b, d_in), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ] + [
        pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd, memory_space=pltpu.VMEM)
        for w in flat
    ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile_b, d_out), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b_pad, d_out), jnp.float32),
        interpret=interpret,
    )(x, *flat)
    return out[:b]


@partial(jax.jit, static_argnames=("num_hidden", "tile_b", "interpret"))
def generator_fused(
    variables: Any,
    spectra: jax.Array,
    num_hidden: int = 2,
    tile_b: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in fused replacement for `MLPGenerator.apply(..., train=False)`:
    spectra (B, S) -> normalized params (B, 4), with BatchNorm folded into
    the dense weights."""
    layers, head = extract_generator_weights(variables, num_hidden)
    return fused_dense_chain(
        spectra, layers, head, hidden_act="relu", final_act="tanh",
        tile_b=tile_b, interpret=interpret,
    )


@partial(jax.jit, static_argnames=("spectrum_dim", "num_blocks", "tile_b", "interpret"))
def forward_surrogate_fused(
    variables: Any,
    params_norm: jax.Array,
    spectrum_dim: int = 250,
    num_blocks: int = 5,
    tile_b: int = 256,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in fused replacement for `ForwardMLP.apply(..., train=False)`:
    params (B,4) -> (spectrum (B,250), metrics (B,8))."""
    layers, head = extract_forward_mlp_weights(variables, num_blocks)
    out = fused_mlp_forward(
        params_norm, layers, head, tile_b=tile_b, interpret=interpret
    )
    return out[:, :spectrum_dim], out[:, spectrum_dim:]
