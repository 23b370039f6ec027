"""Analytic cost model for the fused PI-GAN training step.

Counts the matmul FLOPs, streamed HBM bytes and resident state bytes of
one D->G training step (the workload bench.py times), so throughput
numbers can be reported as utilization — TFLOP/s, MFU, HBM GB/s —
instead of steps/s alone (round-3 verdict: "fast vs a CPU baseline is
proven; fast in absolute terms is asserted").

Two FLOP notions:

- ``model_flops``: logical 2*MACs of the reference network shapes
  (S=250 etc.) — the numerator for MFU, comparable across backends.
- ``padded_flops``: the MACs actually executed after the megakernel's
  lane padding (spectrum+param concat widened to the 256-lane W; F's
  input row block padded 4->8).  The 4/1-wide output heads run on the
  VPU as rank<=4 lane reductions (ops/megakernel.py vector-head note),
  so their MACs are counted at true width in both notions.

MFU is quoted against the MXU matmul peak for the detected device.  On
v5e the kernel's nominally-fp32 matmuls run at the bf16 MXU rate: jnp.dot
under the default precision feeds the 128x128 systolic array bf16-rounded
operands with fp32 accumulation, which is why measured bf16-operand
ablations buy ~nothing (RESULTS.md "bfloat16 compute") — so one peak
(197 TFLOP/s for v5e) covers both compute dtypes.

Reference workload anchor: train_pigan.py's alternating D/G update at
batch 64 (SURVEY.md §2.3 rows 13-14); dims from config.py defaults.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax

from ..config import PiGanConfig

LANE = 128

# MXU matmul peak (dense fp32-accumulated bf16 ops/s) by device_kind
# prefix.  Sources: public TPU spec sheets (v5e 197 TFLOP/s bf16,
# v5p 459, v4 275, v6e 918).  Unknown kinds -> None (MFU omitted).
MXU_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,
    "TPU v5e": 197e12,
    "TPU v5p": 459e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
    "TPU v6e": 918e12,
}

# HBM bandwidth (bytes/s) by device_kind prefix, same sources.
HBM_PEAK_BYTES = {
    "TPU v5 lite": 819e9,
    "TPU v5e": 819e9,
    "TPU v5p": 2765e9,
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,
    "TPU v6e": 1640e9,
}


def device_peak_flops(device_kind: str) -> float | None:
    for prefix, peak in MXU_PEAK_FLOPS.items():
        if device_kind.startswith(prefix):
            return peak
    return None


def device_peak_hbm(device_kind: str) -> float | None:
    for prefix, peak in HBM_PEAK_BYTES.items():
        if device_kind.startswith(prefix):
            return peak
    return None


def compiled_fn_analysis(fn, *args, **kwargs) -> dict:
    """XLA's own cost analysis of ``jit(fn)(*args, **kwargs)``.

    The analytic model below covers the baseline MLP trio only; for the
    enhanced variants (conv/attention/residual/branched — arbitrary
    compute graphs) the compiled program's cost analysis is the single
    generic FLOP source, so per-variant throughput can be quoted as
    TFLOP/s / MFU too (RESULTS.md "Enhanced variants").  Returns
    ``{"flops": float, "bytes_accessed": float}`` (0.0 when the backend
    omits a key).  Counts reflect the *optimized* HLO on the current
    default backend — CPU and TPU agree on matmul FLOPs, which dominate
    every trio here.
    """
    ca = jax.jit(fn).lower(*args, **kwargs).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jaxlibs: one dict per device
        ca = ca[0] if ca else {}
    ca = ca or {}
    return {
        "flops": float(ca.get("flops", 0.0)),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
    }


def _chain_macs(dims: tuple[int, ...]) -> int:
    """Per-sample MACs of one forward pass through Dense dims[0]->...->[-1]."""
    return sum(a * b for a, b in zip(dims[:-1], dims[1:]))


def _lane(n: int, m: int = LANE) -> int:
    return -(-n // m) * m


@dataclass(frozen=True)
class StepCosts:
    model_flops: int        # logical FLOPs per train step (both phases)
    padded_flops: int       # lane-padded FLOPs the kernel executes
    stream_bytes: int       # HBM->VMEM bytes streamed per step (megakernel)
    state_bytes: int        # VMEM-resident state (params+moments+stats+frozen)
    xla_hbm_bytes: int      # HBM bytes/step the XLA scan moves (state traffic)


def pigan_step_costs(cfg: PiGanConfig, settings) -> StepCosts:
    """Cost of ONE fused D->G training step under these settings.

    Matmul inventory mirrors ops/megakernel.py's step body:

    D phase: shared G forward (B), D forward on the 2B concat batch,
    D backward dW+dX on the 2B batch; WGAN-GP adds the GP forward chain
    (critic dX at B) plus its second-order backward (~2x that chain).
    G phase: fresh D forward on fake (B), D dX back to the input (B),
    G backward dW+dX, F forward, F dX when detach_forward=False;
    cycle_w > 0 adds a second G pass forward+backward; stability_w > 0
    adds a noisy G forward plus its hand adjoint (dW+dX).

    A full backward costs 2x its forward MACs (per layer dW = act^T dz
    and dX = dz W^T); dX-only chains cost 1x.
    """
    S = cfg.data.spectrum_dim
    P = cfg.data.param_dim
    M = cfg.data.metrics_dim
    B = cfg.train.batch_size
    gh = tuple(cfg.generator.hidden_dims)
    dh = tuple(cfg.discriminator.hidden_dims)
    fh = tuple(cfg.forward_model.hidden_dims)
    W = _lane(S + P)

    g_log = _chain_macs((S,) + gh + (P,))
    d_log = _chain_macs((S + P,) + dh + (1,))
    f_log = _chain_macs((P,) + fh + (S + M,))
    # padded widths the kernel executes: concat inputs widened to W, F's
    # input rows padded to 8; the narrow heads stay true-width (VPU)
    g_pad = _chain_macs((W,) + gh + (P,))
    d_pad = _chain_macs((W,) + dh + (1,))
    f_pad = _chain_macs((8,) + fh) + fh[-1] * _lane(S + P) + fh[-1] * M

    wgan = settings.gan_loss == "wgan_gp"
    cyc = float(getattr(settings, "cycle_w", 0.0)) > 0.0
    stab = float(getattr(settings, "stability_w", 0.0)) > 0.0
    inoise = float(getattr(settings, "instance_noise", 0.0)) > 0.0

    def step_macs(gm: int, dm: int, fm: int) -> int:
        macs = gm + 2 * dm + 4 * dm          # D phase: G fwd, D fwd 2B, D bwd 2B
        if wgan:
            macs += 3 * dm                   # GP fwd chain + 2nd-order bwd
        macs += dm + dm + 2 * gm + fm        # G phase: D fwd+dX, G bwd, F fwd
        if not settings.detach_forward:
            macs += fm                       # F dX
        if cyc:
            macs += 3 * gm                   # second G pass fwd + bwd
        if stab:
            macs += 3 * gm                   # noisy G fwd + hand adjoint
        return macs * B

    model_flops = 2 * step_macs(g_log, d_log, f_log)
    padded_flops = 2 * step_macs(g_pad, d_pad, f_pad)

    # ---- megakernel HBM stream per step (matches _kernel_body in_specs):
    # spectra (B, W) + params (B, LANE) + metrics (B, LANE) + sched (1,
    # LANE) fp32, plus the optional noise streams; one (1, LANE) metrics
    # row written back per row_steps (negligible, counted at 1/step).
    stream = B * W + 2 * B * LANE + LANE + LANE
    if inoise:
        stream += 2 * B * W
    if stab:
        stream += B * W
    if wgan:
        stream += B * LANE
    stream_bytes = 4 * stream

    # ---- VMEM-resident state, from the kernel's own packed-buffer spec
    # tables (single source of truth for shapes)
    from .megakernel import _f_layer_paths, _train_tensor_specs  # noqa: PLC0415

    train_elems = sum(3 * r * c for _, (r, c) in _train_tensor_specs(S))
    stats_elems = 2 * (gh[0] + gh[1])
    frozen_elems = 0
    in_dim = 8
    for d_out, _paths in zip(fh, _f_layer_paths()):
        frozen_elems += in_dim * d_out + 3 * d_out   # kernel + bias + LN(2)
        in_dim = d_out
    frozen_elems += fh[-1] * W + W + 8 * fh[-1] + LANE   # spec+metric heads
    ema_elems = (
        sum(r * c for _, (r, c) in _train_tensor_specs(S)[:10])
        if float(getattr(settings, "ema_decay", 0.0)) > 0.0 else 0
    )
    state_bytes = 4 * (train_elems + stats_elems + frozen_elems + ema_elems)

    # ---- XLA-scan HBM traffic/step: read AND write params+mu+nu for G
    # and D, read the frozen F params, stream the batch — the reason the
    # XLA step is bandwidth-bound (megakernel module docstring).
    g_params = g_log + sum(gh) + P + 2 * (gh[0] + gh[1])   # + BN scale/bias
    d_params = d_log + sum(dh) + 1
    f_params = f_log + sum(fh) + S + M + 2 * sum(fh)       # + LN scale/bias
    xla_hbm = 4 * (
        2 * 3 * (g_params + d_params) + f_params + B * (S + P + M)
    )
    return StepCosts(
        model_flops=int(model_flops),
        padded_flops=int(padded_flops),
        stream_bytes=int(stream_bytes),
        state_bytes=int(state_bytes),
        xla_hbm_bytes=int(xla_hbm),
    )
