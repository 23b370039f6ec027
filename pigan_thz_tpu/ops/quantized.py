"""Int8 quantized serving path for the baseline inverse-design cycle.

Extends the serving dtype ladder (fp32 -> bf16 -> int8) one rung further
down for the v5e's native int8 MXU: 2x the bf16 MAC rate and int8 matmul
operands (4x less activation traffic than fp32).  The reference
(jianghu105/PI-GAN-THz) has no serving/deployment path at all; this is a
TPU-native extension of `serve.make_inverse_design_fn`.

Scheme (standard symmetric post-training quantization, AQT-style):

- Weights: per-output-channel symmetric int8 — ``w_q = round(W / sw)``
  with ``sw[j] = max|W[:, j]| / 127``, computed ONCE at build time.  The
  generator's BatchNorms are folded into the dense weights first
  (`ops.pallas_kernels.fold_batchnorm` — exact for inference).
- Activations: dynamic per-row symmetric int8 — ``sx[i] = max|x[i, :]| /
  127`` (no cross-batch reduction, so XLA fuses the quantize into the
  producing elementwise chain and the tensor crossing the fusion boundary
  into each matmul is int8).
- Matmul: ``int8 x int8 -> int32`` via `lax.dot_general` with
  ``preferred_element_type=int32`` — the form XLA lowers to the MXU's
  native int8 path on TPU (and to VNNI/dp4a-style kernels on CPU/GPU, so
  exported artifacts stay portable).
- Everything BETWEEN matmuls (dequant, LayerNorm, LeakyReLU/ReLU/tanh,
  bias) runs in fp32: ``out = acc * (sx ⊗ sw) + b``.

Accuracy and throughput are characterized in RESULTS.md ("Int8 serving");
tests/test_quantized.py pins the error envelope against the fp32 chain.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp

from .pallas_kernels import extract_forward_mlp_weights, extract_generator_weights


def quantize_weight(W: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-output-channel symmetric int8: returns (w_q int8 (I, O), sw (O,))
    with W ~= w_q * sw[None, :]."""
    sw = jnp.max(jnp.abs(W), axis=0) / 127.0
    sw = jnp.maximum(sw, jnp.finfo(jnp.float32).tiny)
    w_q = jnp.clip(jnp.round(W / sw[None, :]), -127, 127).astype(jnp.int8)
    return w_q, sw.astype(jnp.float32)


def _quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic per-row symmetric int8: returns (x_q int8 (B, I), sx (B, 1))."""
    sx = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, jnp.finfo(jnp.float32).tiny)
    x_q = jnp.clip(jnp.round(x / sx), -127, 127).astype(jnp.int8)
    return x_q, sx


def qdense(x: jax.Array, w_q: jax.Array, sw: jax.Array, b: jax.Array) -> jax.Array:
    """fp32 x (B, I) -> fp32 (B, O) through an int8 MXU matmul."""
    x_q, sx = _quantize_rows(x)
    acc = jax.lax.dot_general(
        x_q, w_q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * (sx * sw[None, :]) + b[None, :]


def quantize_dense_chain(layers: Sequence[tuple], head: tuple):
    """[(W, b)] + (W, b) -> quantized [(w_q, sw, b)] + (w_q, sw, b)."""
    q_layers = [(*quantize_weight(W), b) for W, b in layers]
    return q_layers, (*quantize_weight(head[0]), head[1])


def quantize_generator(g_variables: Any, num_hidden: int = 2):
    """BN-folded baseline MLPGenerator -> int8 chain (validates the layout
    like `extract_generator_weights`)."""
    layers, head = extract_generator_weights(g_variables, num_hidden)
    return quantize_dense_chain(layers, head)


def quantize_forward(f_variables: Any, num_blocks: int = 5):
    """Baseline ForwardMLP -> (int8 blocks [(w_q, sw, b, ln_scale, ln_bias)],
    int8 head (w_q, sw, b))."""
    layers, head = extract_forward_mlp_weights(f_variables, num_blocks)
    q_layers = [
        (*quantize_weight(W), b, scale, bias) for W, b, scale, bias in layers
    ]
    return q_layers, (*quantize_weight(head[0]), head[1])


def int8_generator_apply(q_chain, spectra: jax.Array) -> jax.Array:
    """spectra (B, S) -> normalized params (B, 4) via the int8 chain."""
    q_layers, q_head = q_chain
    h = spectra.astype(jnp.float32)
    for w_q, sw, b in q_layers:
        h = jnp.maximum(qdense(h, w_q, sw, b), 0.0)
    w_q, sw, b = q_head
    return jnp.tanh(qdense(h, w_q, sw, b))


def int8_forward_apply(
    q_chain, params_norm: jax.Array, spectrum_dim: int,
    leaky_slope: float = 0.2, ln_eps: float = 1e-6,
) -> tuple[jax.Array, jax.Array]:
    """params_norm (B, 4) -> (spectrum (B, S), metrics (B, 8)) via int8."""
    q_layers, q_head = q_chain
    h = params_norm.astype(jnp.float32)
    for w_q, sw, b, scale, bias in q_layers:
        h = qdense(h, w_q, sw, b)
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.mean((h - mean) ** 2, axis=-1, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + ln_eps)
        h = h * scale[None, :] + bias[None, :]
        h = jnp.where(h >= 0.0, h, leaky_slope * h)
    w_q, sw, b = q_head
    out = qdense(h, w_q, sw, b)
    return out[..., :spectrum_dim], out[..., spectrum_dim:]


def make_int8_cycle_fn(g_variables: Any, f_variables: Any, spectrum_dim: int):
    """Build-once int8 cycle: spectra (B, S) -> (params_norm, spec, metrics).

    Quantization (weight scales, BN folding) happens here, outside the
    jitted function, so the returned callable closes over int8 weights and
    the serving program contains no quantize-weights work."""
    qg = quantize_generator(g_variables)
    qf = quantize_forward(f_variables)

    def fn(spectra: jax.Array):
        pn = int8_generator_apply(qg, spectra)
        spec, met = int8_forward_apply(qf, pn, spectrum_dim)
        return pn, spec, met

    return fn
