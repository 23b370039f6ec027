"""Whole-epoch fused training megakernel (Pallas, single chip).

Motivation (measured, v5e-1): the XLA fused D->G step runs ~18k steps/s ==
~55 us/step.  Per step it moves every parameter plus both Adam moment sets
through HBM (~52 MB => ~63 us at 819 GB/s) — the step is HBM-BANDWIDTH
BOUND on optimizer-state traffic, not compute (~0.6 GFLOP/step ~= 15-25 us
fp32).  This kernel removes that traffic entirely: G/D parameters, Adam
moments, BatchNorm statistics and the frozen forward surrogate stay RESIDENT
IN VMEM across an entire multi-epoch chunk (sequential Pallas grid with
constant-index blocks), and only the 128 KB minibatch streams in per step.

Scope: the DEFAULT training configuration — the reference's main protocol
(train_pigan.py:114-187 semantics as implemented by
train.steps.make_pigan_step) with the baseline MLP trio:

- G: Dense(S->512) BN ReLU, Dense(512->256) BN ReLU, Dense(256->4), tanh
  (models/generator.py:26-41);
- D: Dense(S+4->512) LeakyReLU(.2), Dense(512->256) LeakyReLU, Dense(256->1)
  logits (models/discriminator.py:37-50);
- F (frozen, eval): 5x [Dense LN LeakyReLU], Dense(256->S+8) split head
  (models/forward_model.py:30-53);
- BCE objective with label smoothing, BOTH detach_forward modes (False
  backprops through the frozen F in-kernel: LayerNorm backward + the
  Maxwell second-difference adjoint); since round 3 also the PROGRAM-PHASE
  knobs: d_update_every (gated D Adam + per-update D schedule counts),
  enhanced constraint loss with per-epoch annealing scales, cycle
  consistency (full second G pass forward + backward), sigmoid_squash,
  per-phase lr/schedule optimizer overrides, the generator EMA track
  (VMEM-resident lerp), and the stochastic knobs — data augmentation,
  D-input instance noise, input-noise stability loss (second G pass with
  hand adjoint), resonance-window loss — whose noise streams are
  precomputed OUTSIDE the kernel from the exact per-step rng chain the
  XLA step splits, making parity bitwise in the inputs; and WGAN-GP with
  a hand-derived SECOND-order backward for the gradient penalty (the
  leaky-relu masks are piecewise constant, so grad-of-grad holds them
  fixed — identical to XLA autodiff).  The FULL StepSettings surface is
  in-envelope; `supports_megakernel` now guards only model/config shape
  (baseline MLP trio, default dims/slopes, clip > 0, batch % 8).

Measured on v5e-1 (60k-step runs, device_get sync; RESULTS.md table):
16.7 us/step detached / 19.0 us through-F vs 41.9 / 45.3 for the best XLA
scan — 2.4-2.5x.

Parity: the kernel reproduces the XLA step's math exactly — flax BatchNorm
(biased batch var, rsqrt, eps 1e-5, momentum .9 running update), flax
LayerNorm (eps 1e-6), optax clip_by_global_norm -> scale_by_adam (bias
corrections at count+1) -> scale_by_schedule (lr at pre-increment count),
the 2x-mean concat-batch BCE, the double-counted recon weight, the
[0,1]-window range loss on tanh outputs.  Schedules and Adam bias
corrections are precomputed OUTSIDE the kernel by evaluating the very same
optax schedule objects on a step-index vector, so there is one source of
truth.  tests/test_megakernel.py asserts the full state (params, moments,
BN stats, opt counts) matches the XLA `make_multi_epoch_fn` trajectory.

All feature axes are zero-padded to lane multiples; padded weight
rows/columns are zero, so every matmul is exact and padded gradients stay
identically zero (Adam keeps 0 moments there).  Loss means divide by the
TRUE element counts.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import PiGanConfig
from ..data.dataset import epoch_indices
from ..train.schedules import cosine_schedule, step_schedule

LANE = 128


def _up(n: int, m: int = LANE) -> int:
    return -(-n // m) * m


# ---------------------------------------------------------------------------
# Support envelope
# ---------------------------------------------------------------------------


def supports_megakernel(cfg: PiGanConfig, settings) -> str | None:
    """Return None if the megakernel reproduces this configuration exactly,
    else a human-readable reason for falling back to the XLA path."""
    if cfg.generator.name != "mlp" or tuple(cfg.generator.hidden_dims) != (512, 256):
        return "generator is not the baseline MLP(512,256)"
    if cfg.generator.norm != "batch":
        return "generator norm is not batchnorm"
    if cfg.discriminator.name != "mlp" or tuple(cfg.discriminator.hidden_dims) != (512, 256):
        return "discriminator is not the baseline MLP(512,256)"
    if cfg.forward_model.name != "mlp" or tuple(cfg.forward_model.hidden_dims) != (
        256, 512, 1024, 512, 256,
    ):
        return "forward model is not the baseline MLP"
    if cfg.train.compute_dtype not in ("float32", "bfloat16"):
        return f"compute_dtype {cfg.train.compute_dtype!r} unsupported"
    if cfg.train.adam_state_dtype != "float32":
        # bf16 moments need the split param/moment buffer layout, which
        # miscompiles on v5e (round-3d root cause: the split DOUBLED the
        # aliased operand count and corrupted both kernels — small-grid
        # NaNs + finite-but-wrong forward training; RESULTS.md).  The
        # kernel carries the hardware-validated packed (3, r, c) fp32
        # layout; narrow moments stay an XLA-path feature
        # (schedules.scale_by_adam_bf16).
        return "adam_state_dtype != float32 is XLA-path only"
    if cfg.data.param_dim != 4 or cfg.data.metrics_dim != 8:
        return "non-default param/metrics dims"
    if cfg.discriminator.leaky_slope != 0.2 or cfg.forward_model.leaky_slope != 0.2:
        return "non-default leaky_slope (kernel hardcodes 0.2)"
    if cfg.train.grad_clip <= 0:
        return "grad_clip <= 0 (kernel assumes the optax clip stage exists)"
    if cfg.train.batch_size % 8 != 0:
        return "batch_size not a multiple of 8 (TPU sublane tiling)"
    s = settings
    if s.gan_loss not in ("bce", "wgan_gp"):
        return f"gan_loss {s.gan_loss!r} unsupported"
    if s.d_update_every < 1:
        return "d_update_every < 1"
    # kl_w needs no in-kernel support: bnn_kl_loss is identically zero
    # (ops/losses.py:105-107, loss.py:129-147 parity), so kl_w * 0
    # contributes nothing on either backend.
    return None


def supports_gan_subepoch(settings) -> str | None:
    """Extra envelope for the chained GAN sub-epoch driver
    (make_pallas_subepoch_fn, datasets past the one-program grid
    envelope).  The stochastic knobs consume per-STEP keys from an rng
    chain that spans the whole epoch — the one-program prologue scans it
    once for all T steps (make_pallas_multi_epoch_fn._streams), but a
    chained call at epoch offset o would need the chain advanced o*9
    splits, an O(spe) sequential prologue per call.  Until a use case
    needs them at this scale, datasets past the boundary train these
    knobs on the XLA path (Trainer auto mode routes; 'force' raises)."""
    s = settings
    if (
        float(s.augment_noise) > 0.0
        or float(s.augment_shift) > 0.0
        or float(s.augment_scale) > 0.0
    ):
        return "data augmentation streams need the whole-epoch rng chain"
    if float(s.instance_noise) > 0.0:
        return "instance-noise streams need the whole-epoch rng chain"
    if float(s.stability_w) > 0.0:
        return "stability-noise streams need the whole-epoch rng chain"
    if s.gan_loss == "wgan_gp":
        return "the WGAN-GP eps stream needs the whole-epoch rng chain"
    return None


# ---------------------------------------------------------------------------
# State packing: PiGanState <-> padded VMEM buffers
# ---------------------------------------------------------------------------


def _pad2(x: jax.Array, rows: int, cols: int) -> jax.Array:
    x = x.reshape((1, -1) if x.ndim == 1 else x.shape)
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, cols - x.shape[1])))


def _crop(x: jax.Array, shape) -> jax.Array:
    if len(shape) == 1:
        return x[0, : shape[0]]
    return x[: shape[0], : shape[1]]


# (path-into-params, padded (rows, cols)); G then D, fixed order.  Paths are
# the flax module tree of the baseline trio (see module docstring).
def _train_tensor_specs(S: int):
    W = _up(S + 4)  # shared padded width of spectrum-like axes
    return [
        (("g", "MLPBlock_0", "Dense_0", "kernel"), (W, 512)),
        (("g", "MLPBlock_0", "Dense_0", "bias"), (1, 512)),
        (("g", "MLPBlock_0", "NormAct_0", "BatchNorm_0", "scale"), (1, 512)),
        (("g", "MLPBlock_0", "NormAct_0", "BatchNorm_0", "bias"), (1, 512)),
        (("g", "MLPBlock_1", "Dense_0", "kernel"), (512, 256)),
        (("g", "MLPBlock_1", "Dense_0", "bias"), (1, 256)),
        (("g", "MLPBlock_1", "NormAct_0", "BatchNorm_0", "scale"), (1, 256)),
        (("g", "MLPBlock_1", "NormAct_0", "BatchNorm_0", "bias"), (1, 256)),
        (("g", "Dense_0", "kernel"), (8, 256)),   # TRANSPOSED, see below
        (("g", "Dense_0", "bias"), (1, LANE)),
        (("d", "Dense_0", "kernel"), (W, 512)),
        (("d", "Dense_0", "bias"), (1, 512)),
        (("d", "Dense_1", "kernel"), (512, 256)),
        (("d", "Dense_1", "bias"), (1, 256)),
        (("d", "Dense_2", "kernel"), (8, 256)),   # TRANSPOSED, see below
        (("d", "Dense_2", "bias"), (1, LANE)),
    ]


# Output-head kernels live in VMEM TRANSPOSED (true shapes (256, 4) and
# (256, 1), stored as rows of an (8, 256) buffer): as row vectors, the
# 256->4/1 head matmuls and every backward contraction touching them
# (dW = act^T dz, dh = dz W^T) collapse to rank<=4 VPU broadcast/reduce
# ops, removing 8 of the ~29 MXU ops per train step — the step is
# MXU-latency-bound at these tiny shapes (RESULTS.md bf16 ablation), so
# op COUNT is what the cap on throughput is made of.  pack/unpack are the
# only places aware of the layout; checkpoints and the flax tree keep the
# canonical (256, n) orientation.
_TRANSPOSED = {("g", "Dense_0", "kernel"), ("d", "Dense_2", "kernel")}


_N_G = 10  # first 10 train tensors belong to G, rest to D


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    if len(path) == 1:
        return {**tree, path[0]: value}
    return {**tree, path[0]: _set(tree[path[0]], path[1:], value)}


def _f_layer_paths():
    out = []
    for i in range(5):
        blk = f"MLPBlock_{i}"
        out.append((
            (blk, "Dense_0", "kernel"), (blk, "Dense_0", "bias"),
            (blk, "NormAct_0", "LayerNorm_0", "scale"),
            (blk, "NormAct_0", "LayerNorm_0", "bias"),
        ))
    return out


_F_DIMS = (256, 512, 1024, 512, 256)


def pack_state(state, S: int, frozen_bf16: bool = False):
    """PiGanState -> (train_bufs, stat_bufs, frozen_bufs), all padded fp32.

    train buf = stack([param, adam_mu, adam_nu]) -> (3, r, c);
    stat buf  = stack([running_mean, running_var]) -> (2, 1, c).

    The packed (3, r, c) layout is a HARDWARE invariant, not a style
    choice: splitting it into (1, r, c) param + (2, r, c) moment planes
    (to carry bf16 moments) doubled the aliased operand count and
    miscompiled both kernels on v5e — deterministic small-grid NaNs and
    finite-but-wrong forward training, exact in interpret mode
    (round-3d root cause, RESULTS.md).  supports_megakernel gates
    adam_state_dtype != float32 onto the XLA path instead.

    frozen_bf16 stores F's MXU-consumed matrices (the four hidden-layer
    kernels and the spectrum head) in bfloat16 — bit-identical to
    compute_dtype="bfloat16"'s per-use operand cast, at half the reads;
    the VPU-consumed tensors (input layer, metrics head, biases, LN
    params) stay fp32 exactly like the per-use-cast kernel."""
    gP, dP = state.g.params, state.d.params
    g_adam = state.g_opt[1][0]
    d_adam = state.d_opt[1][0]
    trees = {"g": (gP, g_adam.mu, g_adam.nu), "d": (dP, d_adam.mu, d_adam.nu)}
    train = []
    for path, (r, c) in _train_tensor_specs(S):
        p, mu, nu = trees[path[0]]
        tr = path in _TRANSPOSED

        def grab(t):
            x = _get(t, path[1:])
            x = x.T if tr else x
            return x.astype(jnp.float32)

        train.append(jnp.stack([
            _pad2(grab(p), r, c), _pad2(grab(mu), r, c), _pad2(grab(nu), r, c),
        ]))
    bs = state.g.extra["batch_stats"]
    stats = []
    for blk, c in (("MLPBlock_0", 512), ("MLPBlock_1", 256)):
        bn = bs[blk]["NormAct_0"]["BatchNorm_0"]
        stats.append(jnp.stack([
            _pad2(bn["mean"], 1, c), _pad2(bn["var"], 1, c),
        ]))
    fP = state.f.params
    frozen = []
    # F's input layer has 4 TRUE rows (the params) — packed (8, 256), and
    # the kernel does the 4-row contraction on the VPU (vector-head note)
    in_dim = 8
    for dims_out, paths in zip(_F_DIMS, _f_layer_paths()):
        kw, bw, sc, bi = paths
        frozen += [
            _pad2(_get(fP, kw), in_dim, dims_out),
            _pad2(_get(fP, bw), 1, dims_out),
            _pad2(_get(fP, sc), 1, dims_out),
            _pad2(_get(fP, bi), 1, dims_out),
        ]
        in_dim = dims_out
    W = _up(S + 4)
    head_k = fP["Dense_0"]["kernel"]          # (256, S+8)
    head_b = fP["Dense_0"]["bias"]
    frozen += [
        _pad2(head_k[:, :S], 256, W), _pad2(head_b[:S], 1, W),
        # metrics head stored TRANSPOSED (8 true rows x 256): the 256->8
        # projection and its backward run on the VPU (vector-head note)
        _pad2(head_k[:, S:].T, 8, 256), _pad2(head_b[S:], 1, LANE),
    ]
    if frozen_bf16:
        # MXU-consumed matrices only: layer 1-4 kernels + spectrum head
        for idx in (4, 8, 12, 16, 20):
            frozen[idx] = frozen[idx].astype(jnp.bfloat16)
    return train, stats, frozen


def pack_ema(state, S: int):
    """state.g_ema -> 10 padded (1, r, c) buffers (G tensor order)."""
    out = []
    for path, (r, c) in _train_tensor_specs(S)[:_N_G]:
        x = _get(state.g_ema, path[1:])
        if path in _TRANSPOSED:
            x = x.T
        out.append(_pad2(x, r, c).reshape(1, r, c))
    return out


def unpack_state(state, train_out, stats_out, n_steps: int, S: int,
                 d_steps=None, ema_out=None):
    """Rebuild a PiGanState from the kernel's updated buffers.  `d_steps`
    (default n_steps) is D's ACTUAL update count — with d_update_every > 1
    the skipped steps leave D's optimizer state untouched, exactly like the
    XLA skip branch."""
    gP, dP = state.g.params, state.d.params
    g_adam, g_sched = state.g_opt[1]
    d_adam, d_sched = state.d_opt[1]
    new = {
        "g": [gP, g_adam.mu, g_adam.nu],
        "d": [dP, d_adam.mu, d_adam.nu],
    }
    for (path, _), buf in zip(_train_tensor_specs(S), train_out):
        for slot in range(3):
            tgt = new[path[0]][slot]
            leaf = _get(tgt, path[1:])
            if path in _TRANSPOSED:
                val = _crop(buf[slot], (leaf.shape[1], leaf.shape[0])).T
            else:
                val = _crop(buf[slot], leaf.shape)
            new[path[0]][slot] = _set(tgt, path[1:], val.astype(leaf.dtype))
    bs = state.g.extra["batch_stats"]
    for (blk, c), buf in zip((("MLPBlock_0", 512), ("MLPBlock_1", 256)), stats_out):
        bn = {"mean": _crop(buf[0], (c,)), "var": _crop(buf[1], (c,))}
        bs = _set(bs, (blk, "NormAct_0", "BatchNorm_0"), bn)
    inc = jnp.asarray(n_steps, g_adam.count.dtype)
    inc_d = inc if d_steps is None else jnp.asarray(d_steps, d_adam.count.dtype)
    g_opt = (state.g_opt[0], (
        g_adam._replace(count=g_adam.count + inc, mu=new["g"][1], nu=new["g"][2]),
        g_sched._replace(count=g_sched.count + inc),
    ))
    d_opt = (state.d_opt[0], (
        d_adam._replace(count=d_adam.count + inc_d, mu=new["d"][1], nu=new["d"][2]),
        d_sched._replace(count=d_sched.count + inc_d),
    ))
    # rng: mirror the XLA step's `rng, *_ = split(rng, 9)` chain so a run is
    # checkpoint-identical whichever backend executed it
    def _advance(r, _):
        return jax.random.split(r, 9)[0], None

    rng, _ = jax.lax.scan(_advance, state.rng, None, length=n_steps)
    extra = {}
    if ema_out is not None:
        g_ema = state.g_ema
        for (path, _), buf in zip(_train_tensor_specs(S)[:_N_G], ema_out):
            shape = _get(g_ema, path[1:]).shape
            if path in _TRANSPOSED:
                val = _crop(buf[0], (shape[1], shape[0])).T
            else:
                val = _crop(buf[0], shape)
            g_ema = _set(g_ema, path[1:], val)
        extra["g_ema"] = g_ema
    return state.replace(
        step=state.step + n_steps,
        rng=rng,
        g=state.g.replace(params=new["g"][0], extra={"batch_stats": bs}),
        d=state.d.replace(params=new["d"][0]),
        g_opt=g_opt,
        d_opt=d_opt,
        **extra,
    )


# ---------------------------------------------------------------------------
# The kernel
# ---------------------------------------------------------------------------

METRIC_KEYS = (
    "d_loss", "g_loss", "d_accuracy", "adv_loss", "recon_spec_loss",
    "recon_metrics_loss", "maxwell_loss", "lc_loss", "param_range_loss",
    "violation_rate",
)
FWD_METRIC_KEYS = ("loss", "spectrum_loss", "metrics_loss")
# _DEBUG_LANES stage-checksum order for the FORWARD kernel (single source
# of truth: the kernel's debug tuple, both drivers' metric dicts, the
# fwd_subepoch probe and the debug-lane test all derive from this)
FWD_DEBUG_KEYS = (
    "x0", "spectra", "ln1", "ln5", "pred_spec", "drecon", "dW6s",
    "dW1", "dx", "lr", "inv1", "inv2", "W1_post",
)

_B1, _B2, _EPS = 0.5, 0.999, 1e-8
_BN_EPS, _LN_EPS, _BN_MOM = 1e-5, 1e-6, 0.9
_SLOPE = 0.2


def _make_adam(b1: float, b2: float, clip: float):
    """In-kernel clip_by_global_norm + Adam over packed (3, r, c) buffers.
    inv1/inv2 are the precomputed 1/(1-b^t) bias corrections.  `gate`
    (scalar 0/1) skips the whole update when 0 — params AND moments stay
    put, reproducing the XLA d_update_every skip branch where the
    optimizer state is untouched."""

    def apply(bufs, grads, lr, inv1, inv2, gate=None):
        gn = jnp.sqrt(sum(jnp.sum(g * g) for g in grads))
        scale = jnp.where(gn < clip, 1.0, clip / gn)
        for ref, g in zip(bufs, grads):
            g = g * scale
            m = b1 * ref[1] + (1.0 - b1) * g
            v = b2 * ref[2] + (1.0 - b2) * g * g
            p = ref[0] - lr * (m * inv1) / (jnp.sqrt(v * inv2) + _EPS)
            if gate is None:
                ref[0], ref[1], ref[2] = p, m, v
            else:
                on = gate > 0.0
                ref[0] = jnp.where(on, p, ref[0])
                ref[1] = jnp.where(on, m, ref[1])
                ref[2] = jnp.where(on, v, ref[2])

    return apply


# Mosaic reliability bounds — post-root-cause (round-3 final sessions).
#
# Every pre-root-cause corruption recipe (single launches >= ~375 from a
# restored state; scanned 120s; the forward kernel's >= 120 per-program
# NaN) was measured under the FUSED program shape: the XLA gather/schedule
# prologue compiled into the SAME jitted program as the aliased
# pallas_call, which corrupts the kernel's VMEM operands on v5e (the
# round-3 root cause; reproduced on demand via _FUSED_PROLOGUE — a fused
# 1x375 control from the same restored state corrupts where the split
# driver is clean).  With the prologue SPLIT into its own program (the
# default), the hardware evidence is:
#
#   GAN, single launch, restored 750-epoch state: clean and XLA-matching
#     at 375 / 900 / 1500 / 3750 / 7500 / 15000 grid steps;
#   GAN, scanned launches in ONE program: 3x120 clean; 4x375 and 20x375
#     still corrupt (finite-but-wrong, deterministic) — the residual
#     Mosaic defect class is SCANNED large launches, not launch size;
#   forward, one launch per program: clean at 120 / 312 / 1440 / 1560
#     total grid steps (the fused-era bound was 105).
#
# Design: every Trainer-built program is ONE launch (the Trainer clamps
# its per-call epoch chunk to _MAX_PROGRAM_GRID = _MAX_GRID, so
# _launch_plan always takes the single-launch branch), and multi-program
# runs chain launches from Python — host-chained async dispatch, one RTT
# per chain.  _MAX_GRID is set 4x under the 15000-step proof to bound
# per-program stream HBM (~0.5 GB at 3750) with margin for in-flight
# programs.  The scan machinery below remains for direct factory callers
# that exceed one launch; scanned launches stay capped at the
# long-scan-proven 75 (50x75 in the round-3 post-split resume soak,
# 20x75 in pre-split bench chains).
_MAX_GRID = 3750
_MAX_GRID_MULTI = 75
# Forward kernel: one launch per jitted program (multi-launch
# decomposition never helped it — 2x75 failed where 1x75 worked even
# pre-split), with E*spe <= _FWD_MAX_TOTAL per program, chained from
# Python (Trainer.pretrain_forward clamps its per-call chunk).  Proven
# clean post-split at 1440 (12x120-sample epochs) and 1560 (5x312); set
# at the proven value.
_FWD_MAX_TOTAL = 1440
# Sub-epoch driver in-flight depth bound: sync (device_get state.step) after
# every N dispatched sub-calls; 0 = never (fully async).  The proven-clean
# single-program pattern is depth-1 (Trainer syncs per chunk reading
# metrics); hardware forensics for the sub-epoch chain set this.
_FWD_SYNC_EVERY = 0
# Same depth bound for the GAN sub-epoch driver (make_pallas_subepoch_fn).
_GAN_SUB_SYNC_EVERY = 0
# Forensic variant: bake each sub-call's epoch offset into its program
# (one jitted program per (live, offset) pair) instead of a traced
# dynamic_slice — isolates the dynamic-slice-fed gather as a trigger.
_FWD_STATIC_OFFSET = False
# Auto-mode gate for the sub-epoch driver.  True since the round-3 root
# cause landed (split prologue — see _FUSED_PROLOGUE): the split driver is
# hardware-clean at the 20k-sample target shapes (gated and ungated, zero
# fallback trips, XLA loss parity — RESULTS.md).  Kept as an off-switch
# should a future hardware/toolchain change regress it; False restores
# the round-3 behavior (spe > _FWD_MAX_TOTAL pretrains on XLA in auto
# mode, 'force' still drives the kernel).
_FWD_SUB_AUTO_OK = True
# Per-PROGRAM grid-total cap for GAN programs.  Equal to _MAX_GRID since
# the root-cause fix: the Trainer clamps its per-call epoch chunk to keep
# each jitted program a SINGLE launch (the proven-unbounded shape), e.g.
# 12 epochs per call at spe=312 (20k samples) with zero padding/gating.
_MAX_PROGRAM_GRID = 3750
# Minimum useful sub-epoch launch size: when steps_per_epoch exceeds the
# multi-launch cap, an epoch is decomposed into launches of the largest
# divisor of spe that fits (_launch_plan).  Datasets whose spe has no
# divisor >= this floor (e.g. prime spe) would degrade to near-per-step
# launches, where launch overhead dominates — instead each epoch is
# PADDED to the nearest step count with a divisor in
# [_MIN_SUB_LAUNCH, cap] and the tail steps are gated into no-ops via
# the sched stream's `live` lane (zero update, zero metric contribution),
# keeping every launch uniform.  GAN kernel only; the forward kernel's
# per-program bound already forces chained single-launch calls.
_MIN_SUB_LAUNCH = 8
# Training steps PACKED into one grid iteration (both kernels): per-step
# stream blocks grow a leading K axis, the grid shrinks K-fold, and the
# kernel body runs its step closure K times (identical per-step math;
# Adam/BN/EMA state lives in VMEM refs, so step k+1 reads step k's
# updates exactly like consecutive grid steps; pack | row_steps |
# launch_steps).  Packing was built to amortize the ~5.9 us/grid-step
# orchestration floor the kernel-ablation probe measured, but on v5e it
# is NOT a throughput win: at the bench shape pack=5 times 19.4 us/step
# vs pack=1's 17.2 (same session) — Mosaic already overlaps the
# orchestration with compute at pack=1, and the K-fold body unroll
# schedules worse.  Packing shipped in round 3b as a CORRECTNESS device
# against small pack=1 grids that NaN'd on v5e — but round 3d bisected
# that whole miscompile class to the split param/moment buffer layout
# (pack_state docstring): with the packed (3, r, c) layout restored,
# pack=1 small grids are hardware-clean again (15/45/75 probed finite
# and bit-deterministic, forward 15-375 at XLA loss parity), so
# _MIN_CLEAN_GRID is 1 and packing never engages in production.  The
# machinery stays as a forensic/ablation device (tests drive it by
# shrinking _MIN_CLEAN_GRID).
_PACK_MAX = 8
# Smallest pack=1 single-launch grid treated as clean on v5e.  1 since
# the round-3d buffer-layout root cause (above): every small-grid NaN
# recipe (examples/pack1_nan_repro.py, grids 15-75) reproduces ONLY on
# the split-layout code and runs clean on the packed (3, r, c) layout.
# Raising this re-arms the round-3b defense: grids below it pack
# (largest row_steps divisor <= _PACK_MAX) and unpackable shapes are
# routed to XLA by the Trainer (small_grid_risk).
_MIN_CLEAN_GRID = 1

# Member-packed ensemble compile envelope: an M=8 single-launch compile
# exceeded 25 minutes on v5e through the TPU tunnel (killed; RESULTS.md
# "Member-packed kernel") — and long remote compiles are also the tunnel's
# RPC-drop failure mode.  M <= 4 is the measured practical envelope.
_MAX_PACKED_M = 4
# Efficiency floor for GAN sub-epoch launch sizes (_gan_sub_plan's
# gated-pad decision): launches below this amortize poorly (one host
# enqueue + stream slice per call), so divisor-poor spe pads to a count
# with a divisor in [floor, _MAX_GRID] instead of degrading to tiny
# chained calls.  Decoupled from _MIN_CLEAN_GRID (a CORRECTNESS
# threshold, 1 since the round-3d root cause) — this one is about launch
# overhead only.
_SUB_LAUNCH_FLOOR = 120
_DEBUG_LANES = False  # dev aid: extra in-kernel checksums in metric lanes 10+
_DEBUG_PER_STEP = False  # dev aid: metrics row per STEP instead of per epoch
_NO_ALIAS = False  # dev aid: disable input/output aliasing (extra copies)
# Forensic knobs for the forward sub-epoch NaN bisection (RESULTS.md):
_NO_DONATE = False  # dev aid: sub-calls jit WITHOUT donate_argnums
# ROOT CAUSE (hardware bisection, 2026-08-18): a sub-epoch program whose
# gather/sched prologue lives in the SAME jitted program as the aliased
# pallas_call feeds the kernel corrupted LN scale/bias operands on v5e
# (in-kernel debug lanes: batch x0 finite, inv-stddev finite, ln1 NaN) at
# every probed grid >= ~45-65; the identical kernel with the prologue
# compiled as a SEPARATE jitted program chained host-side is clean at the
# same shapes.  The split is therefore the DEFAULT; this knob restores the
# fused single-program shape for forensics only.
_FUSED_PROLOGUE = False


def _largest_divisor(n: int, cap: int) -> int:
    for d in range(min(n, cap), 0, -1):
        if n % d == 0:
            return d
    return 1


def _resolve_pack(launch_steps: int, row_steps: int) -> int:
    """Steps per grid iteration for a launch of `launch_steps` grid steps
    with metric rows every `row_steps`: 1 (fastest — Mosaic overlaps the
    per-step orchestration) whenever the pack=1 grid is at the proven-clean
    scale, else the largest pack that divides row_steps, moving the program
    out of the small-grid miscompile class (_MIN_CLEAN_GRID note).  A
    return of 1 with launch_steps < _MIN_CLEAN_GRID means the shape CANNOT
    be made safe by packing — callers must route it off the kernel
    (Trainer: small_grid_risk)."""
    if launch_steps >= _MIN_CLEAN_GRID:
        return 1
    return _largest_divisor(row_steps, _PACK_MAX)


def small_grid_risk(E: int, spe: int) -> str | None:
    """Non-None when a GAN megakernel call of E epochs at spe steps/epoch
    would compile into the v5e small-grid miscompile class: a pack=1
    launch below _MIN_CLEAN_GRID grid steps with no usable pack divisor.
    The Trainer runs such chunks on the XLA path instead (a planned
    route, not a fallback trip)."""
    ls, _, rs, _ = _launch_plan(E, spe)
    if _resolve_pack(ls, rs) == 1 and ls < _MIN_CLEAN_GRID:
        return (
            f"launch grid {ls} below the proven-clean scale "
            f"{_MIN_CLEAN_GRID} with no step-pack divisor (row_steps={rs})"
        )
    return None


def small_grid_risk_forward(E: int, spe: int) -> str | None:
    """small_grid_risk for the forward-pretrain kernel (whole-epoch
    driver: one launch of E*spe grid steps per program; the sub-epoch
    driver's per-call launches are planned separately)."""
    if spe > _FWD_MAX_TOTAL:
        return None  # sub-epoch driver: per-call L >= its own plan floor
    ls, _, rs, _ = _resolve_plan(E, spe, padded_streams=False)
    if _resolve_pack(ls, rs) == 1 and ls < _MIN_CLEAN_GRID:
        return (
            f"forward launch grid {ls} below the proven-clean scale "
            f"{_MIN_CLEAN_GRID} with no step-pack divisor (row_steps={rs})"
        )
    return None


def _launch_plan(E: int, spe: int) -> tuple[int, int, int, int]:
    """(launch_steps, n, row_steps, spe_pad): E epochs decompose into n
    IDENTICAL launches of launch_steps grid steps each; row_steps is the
    metric-row granularity (divides both launch_steps and spe_pad, so a
    metric row never straddles a launch or an epoch).

    A single launch may use up to _MAX_GRID grid steps (proven clean —
    with the split prologue the Trainer's per-call clamp makes every
    production program exactly one launch); multi-launch programs cap
    each launch at the tighter _MAX_GRID_MULTI (scanned 375-grid launches
    corrupt where long scans of 75 are proven — see the cap notes above).
    When spe itself exceeds the multi-launch cap,
    each EPOCH decomposes into uniform SUB-EPOCH launches of the largest
    divisor of spe that fits; metric rows then cover row_steps < spe steps
    and _chunked_launch sums them into per-epoch rows.  This lifts the
    megakernel's former spe <= 120 dataset boundary (round 3).

    spe_pad > spe marks a GATED plan (spe with no usable divisor, e.g.
    prime): each epoch is padded to spe_pad grid steps — the smallest
    count with a sub-launch divisor in [_MIN_SUB_LAUNCH, cap] — and the
    padded tail steps are streamed with a zero `live` gate that turns
    them into complete no-ops (no param/moment/BN/EMA update, zero metric
    contribution).  Every launch keeps one uniform, proven-clean shape;
    the overhead is (spe_pad - spe)/spe wasted compute, typically <= 2%
    (a divisor-rich count is never far above spe)."""
    T = E * spe
    if T <= _MAX_GRID:
        return T, 1, spe, spe
    cap = min(_MAX_GRID, _MAX_GRID_MULTI)
    if spe <= cap:
        inner = _largest_divisor(E, max(1, cap // spe))
        return inner * spe, E // inner, spe, spe
    L = _largest_divisor(spe, cap)
    floor = min(_MIN_SUB_LAUNCH, cap)  # caps may be test-shrunk below it
    if L >= floor:
        return L, T // L, L, spe
    best_L, spe_pad = _best_pad_divisor(spe, cap, floor)
    return best_L, E * spe_pad // best_L, best_L, spe_pad


def _best_pad_divisor(n: int, cap: int, floor: int) -> tuple[int, int]:
    """(L, n_pad): the launch size L in [floor, cap] minimizing the padding
    needed to make it divide n, and the padded count n_pad = n + pad.
    Shared by the GAN (_launch_plan) and forward (_fwd_sub_plan) gated
    plans so their padding policies can never drift."""
    best_L, best_pad = 1, None
    for Lc in range(cap, floor - 1, -1):
        pad = (-n) % Lc
        if best_pad is None or pad < best_pad:
            best_L, best_pad = Lc, pad
    return best_L, n + best_pad


def _fwd_sub_plan(spe: int) -> tuple[int, int]:
    """(call_steps, spe_pad) for the forward SUB-EPOCH driver: each epoch
    runs as spe_pad/call_steps chained jitted calls (the forward kernel's
    Mosaic bound is per PROGRAM, so each call is one launch of call_steps
    <= _FWD_MAX_TOTAL).  Divisor-less spe (e.g. prime) pads to the nearest
    count with a divisor in [_MIN_SUB_LAUNCH, _FWD_MAX_TOTAL]; the tail
    call's padded steps are gated no-ops exactly like the GAN kernel's
    gated plans (_launch_plan)."""
    if spe <= _FWD_MAX_TOTAL:
        return spe, spe
    L = _largest_divisor(spe, _FWD_MAX_TOTAL)
    floor = min(_MIN_SUB_LAUNCH, _FWD_MAX_TOTAL)  # caps may be test-shrunk
    if L >= floor:
        return L, spe
    return _best_pad_divisor(spe, _FWD_MAX_TOTAL, floor)


def _gan_sub_plan(spe: int) -> tuple[int, int]:
    """(call_steps, spe_pad) for the GAN SUB-EPOCH driver
    (make_pallas_subepoch_fn, datasets past the one-program envelope):
    each epoch runs as spe_pad/L chained jitted calls, every call ONE
    single launch of L <= _MAX_GRID grid steps (the hardware-proven
    shape).  The floor is _SUB_LAUNCH_FLOOR — an EFFICIENCY bound (a
    launch below it pays more host-enqueue overhead than it amortizes),
    not a correctness one.  Divisor-less spe pads to the nearest count
    with a divisor in [floor, _MAX_GRID]; the tail call's padded steps
    are gated no-ops (`live` lane, exactly like _launch_plan's gated
    plans)."""
    if spe <= _MAX_GRID:
        return spe, spe
    floor = min(_SUB_LAUNCH_FLOOR, _MAX_GRID)  # caps may be test-shrunk
    L = _largest_divisor(spe, _MAX_GRID)
    if L >= floor:
        return L, spe
    return _best_pad_divisor(spe, _MAX_GRID, floor)


def _resolve_plan(E: int, spe: int, padded_streams: bool):
    """_launch_plan, adjusted for callers whose streams are NOT gated
    (forward path, interpret-mode only: the hardware forward driver never
    exceeds one launch per program): a gated plan there falls back to
    exact-divisor decomposition, possibly per-step."""
    ls, n, rs, spe_pad = _launch_plan(E, spe)
    if spe_pad != spe and not padded_streams:
        ls = rs = _largest_divisor(spe, min(_MAX_GRID, _MAX_GRID_MULTI))
        n, spe_pad = E * spe // ls, spe
    return ls, n, rs, spe_pad


def _chunked_launch(launch, bufs, streams, E: int, spe: int,
                    *, padded_streams: bool = True):
    """Drive launch(bufs, stream_slices, n_steps, row_steps) over E epochs
    as a lax.scan of UNIFORM sub-chunks (_launch_plan); returns (bufs,
    per-epoch metrics (E, 1, LANE)).

    Uniformity is a reliability invariant, not a convenience: round-2
    forensics found MIXED launch shapes in one program — a scanned run of
    full-size launches plus a differently-sized tail launch feeding the
    same aliased state buffers (e.g. scan 3x120-grid + tail 1x15-grid, the
    default epochs_per_call=25 checkpoint resume at spe=15) — corrupting
    kernel operands on v5e, while uniform-shape programs ran clean.  Every
    launch in a call has the SAME grid size, eliminating the mixed-shape
    program class entirely (at worst a few extra HBM hops for the state
    bufs, ~0.3 us/step amortized).

    With sub-epoch launches (row_steps < spe) each launch emits partial
    metric rows (epoch-mean contributions: the kernel divides by the TRUE
    steps_per_epoch) which are summed into per-epoch rows here.  On a
    gated plan (spe_pad > spe) the caller streams E*spe_pad padded steps;
    padded rows contribute exact zeros, so the per-epoch sums are
    unchanged."""
    ls, n, rs, spe_pad = _resolve_plan(E, spe, padded_streams)
    assert streams[0].shape[0] == E * spe_pad, (
        f"stream length {streams[0].shape[0]} != plan E*spe_pad "
        f"{E * spe_pad} (padded_streams={padded_streams})"
    )
    xs = tuple(s.reshape((n, ls) + s.shape[1:]) for s in streams)
    bufs, mets = jax.lax.scan(
        lambda carry, x: launch(carry, x, ls, rs), tuple(bufs), xs
    )
    mets = mets.reshape((-1,) + mets.shape[2:])
    if not _DEBUG_PER_STEP and rs != spe_pad:
        mets = mets.reshape((E, spe_pad // rs) + mets.shape[1:]).sum(axis=1)
    return list(bufs), mets


class _MemberView:
    """Member-m view of a ref carrying a leading member axis: presents the
    exact indexing surface the single-member kernel body uses (``ref[k]``
    reads, ``ref[k] = v`` writes) over buffers shaped ``(M, ...)`` — the
    members>1 kernel wraps every per-member ref in one of these so the
    step body is literally the same code for solo and packed members."""

    __slots__ = ("_ref", "_m")

    def __init__(self, ref, m: int):
        self._ref, self._m = ref, m

    def _key(self, k):
        return (self._m,) + (k if isinstance(k, tuple) else (k,))

    def __getitem__(self, k):
        return self._ref[self._key(k)]

    def __setitem__(self, k, v):
        self._ref[self._key(k)] = v


def _make_kernel(
    S: int, B: int, steps_per_epoch: int, settings, clip: float,
    bf16: bool = False, row_steps: int | None = None, padded: bool = False,
    pack: int = 1, members: int = 1,
):
    """`settings.ema_decay > 0` adds 10 aliased G-EMA buffers (one per G
    tensor) lerped after each G update, VMEM-resident like the params.

    `row_steps` (default steps_per_epoch) is the metric-ROW granularity:
    with sub-epoch launches each row accumulates row_steps < spe steps and
    the driver sums rows into epochs (division stays by the TRUE
    steps_per_epoch, so rows are epoch-mean contributions).

    With bf16=True, matmul OPERANDS are cast to bfloat16 (f32
    accumulation via preferred_element_type) — classic mixed precision:
    params, optimizer math, norm stats and every elementwise op stay f32.
    Zero-padding exactness is dtype-independent, so the padding invariants
    hold unchanged."""
    W = _up(S + 4)
    mm_in = jnp.bfloat16 if bf16 else jnp.float32
    rs = row_steps or steps_per_epoch
    if pack < 1 or rs % pack:
        raise ValueError(f"pack {pack} must divide row_steps {rs}")
    if _DEBUG_PER_STEP and pack != 1:
        raise ValueError("_DEBUG_PER_STEP needs pack=1 (row per grid step)")
    if members > 1 and (_DEBUG_PER_STEP or _DEBUG_LANES):
        raise ValueError("debug lanes/per-step rows need members=1")
    if members > 1 and float(settings.ema_decay) > 0.0:
        raise ValueError("member-packed kernel: ema_decay > 0 unsupported")
    w_adv = float(settings.adv_w)
    w_recon = float(settings.recon_w + settings.physics_spec_w)  # double-count
    w_pmet = float(settings.physics_metrics_w)
    w_maxwell = float(settings.maxwell_w)
    w_lc = float(settings.lc_w)
    w_range = float(settings.range_w)
    w_constraint = float(settings.constraint_w)
    w_cycle = float(settings.cycle_w)
    r_lo, r_hi = float(settings.range_lo), float(settings.range_hi)
    lab_r, lab_f = float(settings.label_real), float(settings.label_fake)
    detach = bool(settings.detach_forward)
    sigmoid = bool(settings.sigmoid_squash)
    gate_d = settings.d_update_every > 1
    ema = float(settings.ema_decay) > 0.0
    mu_ema = float(settings.ema_decay)
    # round-3 stochastic knobs: the noise/augment streams are precomputed
    # OUTSIDE the kernel from the exact per-step rng chain the XLA step
    # uses (the driver already mirrors it), so parity is bitwise in the
    # inputs — the kernel just consumes extra streamed operands.
    use_inoise = float(settings.instance_noise) > 0.0
    use_stab = float(settings.stability_w) > 0.0
    wgan = settings.gan_loss == "wgan_gp"
    w_gp = float(settings.gp_weight)
    w_stab = float(settings.stability_w)
    w_window = float(settings.window_w)
    # physics_window_loss defaults as invoked by steps.py:443-447
    # (consistency_weight=0, window_weight=1, f_lo=0.5, f_hi=3.0)
    _F_LO, _F_HI = 0.5, 3.0

    def leaky_mask(pre):
        return jnp.where(pre >= 0.0, 1.0, _SLOPE)

    def dotT0(a, b):
        # contract dim 0 of both: (B, M) x (B, N) -> (M, N)  [dW = act^T @ dz]
        return jax.lax.dot_general(
            a.astype(mm_in), b.astype(mm_in), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dotT1(a, b):
        # contract dim 1 of both: (B, N) x (M, N) -> (B, M)  [dh = dz @ W^T]
        return jax.lax.dot_general(
            a.astype(mm_in), b.astype(mm_in), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def mm(a, b):
        return jnp.dot(
            a.astype(mm_in), b.astype(mm_in), preferred_element_type=jnp.float32
        )

    def csum(x):
        return jnp.sum(x, axis=0, keepdims=True)

    adam_apply = _make_adam(_B1, _B2, clip)

    n_state = 18 + (10 if ema else 0)  # 16 train + 2 stats (+ 10 G EMA)

    def kernel(*refs):
        it = iter(refs)
        spec_ref, par_ref, met_ref, sched_ref = (next(it) for _ in range(4))
        inoise_ref = next(it) if use_inoise else None
        stab_ref = next(it) if use_stab else None
        eps_ref = next(it) if wgan else None
        lo_ref, hi_ref = next(it), next(it)
        frozen = [next(it) for _ in range(24)]
        for _ in range(n_state):   # aliased state inputs; use output refs
            next(it)
        train = [next(it) for _ in range(16)]   # packed (3, r, c) buffers
        stats = [next(it) for _ in range(2)]
        ema_bufs = [next(it) for _ in range(n_state - 18)]
        metrics_ref = next(it)

        i = pl.program_id(0)

        # The step body takes its per-member refs as PARAMETERS: with
        # members == 1 the enclosing-scope refs are passed straight
        # through (identical program to the pre-member-packing kernel);
        # with members > 1 each member passes _MemberView-wrapped refs
        # over the (M, ...) buffers.  sched/lo/hi/frozen stay shared.
        def _one_step(step_k, train, stats, ema_bufs, spec_ref, par_ref,
                      met_ref, inoise_ref, stab_ref, eps_ref):
            sched_row = sched_ref[step_k]       # (1, LANE)
            lr_g = sched_row[0, 0]
            lr_d = sched_row[0, 1]
            inv1_g = sched_row[0, 2]
            inv2_g = sched_row[0, 3]
            inv1_d = sched_row[0, 4]
            inv2_d = sched_row[0, 5]
            d_gate = sched_row[0, 6]   # 1.0 on D-update steps (d_update_every)
            c_scale = sched_row[0, 7]  # per-epoch constraint annealing scale
            # gated launch padding (spe_pad > spe): 0.0 on padded tail steps —
            # every state update below is skipped and the metric row zeroed,
            # so a padded step is a complete no-op (lane 6 is also 0 there,
            # gating D through the d_gate path)
            live = sched_row[0, 8] if padded else None

            spectra = spec_ref[step_k]          # (B, W), cols >= S are zero
            params_phys = par_ref[step_k][:, 0:4]
            metrics_nm = met_ref[step_k][:, 0:8]
            lo = lo_ref[0:1, :]            # (1, LANE), pads zero
            hi = hi_ref[0:1, :]

            (g_w1, g_b1, g_gam1, g_bet1, g_w2, g_b2, g_gam2, g_bet2,
             g_w3, g_b3, d_w1, d_b1, d_w2, d_b2, d_w3, d_b3) = train
            st1, st2 = stats

            # ---- G forward (shared by both phases: same params, same batch) --
            u1 = mm(spectra, g_w1[0]) + g_b1[0]
            mu1 = jnp.mean(u1, axis=0, keepdims=True)
            # flax-exact variance INCLUDING the max(0, .) clamp
            # (flax/linen/normalization.py:140-142): near-dead features
            # (var ~ 0, |mean| ~ 10) make mean(x^2)-mean(x)^2's fp error
            # (~ulp(mean^2) ~ 1.5e-5) exceed eps=1e-5 with a reduction-order-
            # dependent SIGN; without the clamp that is rsqrt(negative) = NaN
            # on some Mosaic compilations (hit on v5e resuming a 50-epoch
            # checkpoint — larger grids compiled a different reduction order).
            var1 = jnp.maximum(
                0.0, jnp.mean(u1 * u1, axis=0, keepdims=True) - mu1 * mu1
            )
            iv1 = jax.lax.rsqrt(var1 + _BN_EPS)
            xh1 = (u1 - mu1) * iv1
            y1 = xh1 * g_gam1[0] + g_bet1[0]
            a1 = jnp.maximum(y1, 0.0)
            u2 = mm(a1, g_w2[0]) + g_b2[0]
            mu2 = jnp.mean(u2, axis=0, keepdims=True)
            var2 = jnp.maximum(
                0.0, jnp.mean(u2 * u2, axis=0, keepdims=True) - mu2 * mu2
            )
            iv2 = jax.lax.rsqrt(var2 + _BN_EPS)
            xh2 = (u2 - mu2) * iv2
            y2 = xh2 * g_gam2[0] + g_bet2[0]
            a2 = jnp.maximum(y2, 0.0)
            # vector head: g_w3 is stored TRANSPOSED (4 true rows x 256) — the
            # 256->4 projection is 4 VPU lane-reductions, not an MXU op
            blane = jax.lax.broadcasted_iota(jnp.int32, (B, LANE), 1)
            z3 = jnp.broadcast_to(g_b3[0], (B, LANE))
            for k in range(4):
                zk = jnp.sum(a2 * g_w3[0][k:k + 1, :], axis=1, keepdims=True)
                z3 = z3 + jnp.where(blane == k, zk, 0.0)
            # the baseline G ends in tanh; sigmoid_squash applies sigmoid ON TOP
            # (constraint_optimizer.py:246 squashes the generator OUTPUT).
            # tanh pads are exactly 0; squashed pads are 0.5 — every consumer is
            # pad-safe either way (range/viol masked to lanes < 4, F's padded
            # input rows are zero, lc/adv use lanes 0:4 only)
            tn = jnp.tanh(z3)                                      # (B, LANE)
            pn = jax.nn.sigmoid(tn) if sigmoid else tn
            pphys = (pn + 1.0) * 0.5 * (hi - lo) + lo   # pads 0 (lo=hi=0 there)

            # ---- D phase: update D on [real; stop_grad(fake)] ----------------
            # spectra cols >= S are zero, so lane-placing the params and ADDING
            # is an exact concat (Mosaic has no dynamic_update_slice)
            def place_params(p4):
                return jnp.concatenate(
                    [jnp.zeros((B, S), jnp.float32), p4,
                     jnp.zeros((B, W - S - 4), jnp.float32)], axis=1
                )

            real_in = spectra + place_params(params_phys)
            fake_in = spectra + place_params(pphys[:, 0:4])
            x0 = jnp.concatenate([real_in, fake_in], axis=0)      # (2B, W)
            if use_inoise:
                # D-phase-only spectrum noise (steps.py:295-298); the stream
                # is zero beyond col S, so param lanes and pads stay clean
                x0 = x0 + inoise_ref[step_k]
            p1 = mm(x0, d_w1[0]) + d_b1[0]
            h1 = jnp.where(p1 >= 0.0, p1, _SLOPE * p1)
            p2 = mm(h1, d_w2[0]) + d_b2[0]
            h2 = jnp.where(p2 >= 0.0, p2, _SLOPE * p2)
            # vector head: d_w3 stored TRANSPOSED (true 256->1 column as row 0)
            w3row = d_w3[0][0:1, :]                               # (1, 256)
            z = jnp.sum(h2 * w3row, axis=1, keepdims=True) + d_b3[0][0:1, 0:1]
            row = jax.lax.broadcasted_iota(jnp.int32, (2 * B, 1), 0)
            probs = jax.nn.sigmoid(z)
            d_acc = 0.5 * (
                jnp.mean((probs[:B] > 0.5).astype(jnp.float32))
                + jnp.mean((probs[B:] <= 0.5).astype(jnp.float32))
            )
            if wgan:
                # Wasserstein critic loss + gradient penalty (steps.py:311-337)
                wass = jnp.mean(z[B:]) - jnp.mean(z[:B])
                # ---- GP forward: critic gradient w.r.t. its INPUT at
                # (clean spectra, eps-interpolated params).  With leaky-relu,
                # grad_x z = W1 (m1 . (W2 (m2 . w3))) with the masks m
                # piecewise-constant — XLA's autodiff also treats them as
                # constants (relu'' = 0 a.e.), so the hand second-order
                # backward below matches exactly.
                eps = eps_ref[step_k][:, 0:1]                           # (B, 1)
                interp4 = eps * params_phys + (1.0 - eps) * pphys[:, 0:4]
                xg_in = spectra + place_params(interp4)            # (B, W)
                p1g = mm(xg_in, d_w1[0]) + d_b1[0]
                m1g = leaky_mask(p1g)
                h1g = jnp.where(p1g >= 0.0, p1g, _SLOPE * p1g)
                p2g = mm(h1g, d_w2[0]) + d_b2[0]
                m2g = leaky_mask(p2g)
                v = m2g * w3row                                    # (B, 256)
                u = dotT1(v, d_w2[0])                              # (B, 512)
                a_m = m1g * u
                gvec = dotT1(a_m, d_w1[0])                         # (B, W); pads 0
                gn = jnp.sqrt(
                    jnp.sum(gvec * gvec, axis=1, keepdims=True) + 1e-12
                )
                gp = jnp.sum((gn - 1.0) ** 2) / B
                # skip steps report the critic loss WITHOUT the gp term
                # (steps.py d_skip_branch); d_gate is 1.0 on update steps
                d_loss = wass + w_gp * d_gate * gp
                dz = jnp.where(row < B, -1.0, 1.0) / B             # (2B, 1)
            else:
                labels = jnp.where(row < B, lab_r, lab_f)
                d_loss = 2.0 * jnp.mean(
                    jnp.maximum(z, 0.0) - z * labels
                    + jnp.log1p(jnp.exp(-jnp.abs(z)))
                )
                dz = 2.0 * (probs - labels) / (2.0 * B)            # (2B, 1)
            lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
            row8 = jax.lax.broadcasted_iota(jnp.int32, (8, 256), 0)
            # transposed-head backward: dW = h2^T dz has ONE true column ->
            # one VPU batch-reduction placed on row 0; dh = dz w3^T is an
            # outer product -> one VPU broadcast
            dWd3 = jnp.where(
                row8 == 0, jnp.sum(h2 * dz, axis=0, keepdims=True), 0.0
            )                                                      # (8, 256)
            dbd3 = jnp.where(lane1 == 0, jnp.sum(dz), 0.0)        # (1, LANE)
            dh2 = dz * w3row                                      # (2B, 256)
            dp2 = dh2 * leaky_mask(p2)
            dWd2 = dotT0(h1, dp2)
            dbd2 = csum(dp2)
            dh1 = dotT1(dp2, d_w2[0])
            dp1 = dh1 * leaky_mask(p1)
            dWd1 = dotT0(x0, dp1)
            dbd1 = csum(dp1)
            if wgan:
                # ---- GP backward (second-order, masks constant): gp depends
                # on W1 (twice: through gvec's outer factor and through a_m's
                # inner chain), W2, and w3 — never on the biases (autodiff
                # agrees: the mask derivative is zero)
                c = w_gp * 2.0 * (gn - 1.0) / (B * gn)             # (B, 1)
                Gt = c * gvec                                      # (B, W)
                dA = mm(Gt, d_w1[0])                               # (B, 512)
                dU = m1g * dA
                dV = mm(dU, d_w2[0])                               # (B, 256)
                dWd1 = dWd1 + dotT0(Gt, a_m)
                dWd2 = dWd2 + dotT0(dU, v)
                dWd3 = dWd3 + jnp.where(
                    row8 == 0, jnp.sum(dV * m2g, axis=0, keepdims=True), 0.0
                )
            adam_apply(
                [d_w1, d_b1, d_w2, d_b2, d_w3, d_b3],
                [dWd1, dbd1, dWd2, dbd2, dWd3, dbd3],
                lr_d, inv1_d, inv2_d,
                gate=d_gate if (gate_d or padded) else None,
            )

            # ---- G phase: adversarial pass through the JUST-UPDATED D --------
            q1 = mm(fake_in, d_w1[0]) + d_b1[0]
            hg1 = jnp.where(q1 >= 0.0, q1, _SLOPE * q1)
            q2 = mm(hg1, d_w2[0]) + d_b2[0]
            hg2 = jnp.where(q2 >= 0.0, q2, _SLOPE * q2)
            w3row_u = d_w3[0][0:1, :]         # re-read: Adam just updated D
            zg = jnp.sum(hg2 * w3row_u, axis=1, keepdims=True) + d_b3[0][0:1, 0:1]
            if wgan:
                adv = -jnp.mean(zg)                                # steps.py:397
                dzg = jnp.full((B, 1), -1.0 / B)
            else:
                adv = jnp.mean(
                    jnp.maximum(zg, 0.0) - zg + jnp.log1p(jnp.exp(-jnp.abs(zg)))
                )
                dzg = (jax.nn.sigmoid(zg) - 1.0) / B
            dhg2 = dzg * w3row_u                                  # (B, 256)
            dq2 = dhg2 * leaky_mask(q2)
            dhg1 = dotT1(dq2, d_w2[0])
            dq1 = dhg1 * leaky_mask(q1)
            dxg = dotT1(dq1, d_w1[0])                             # (B, W)
            dpphys = dxg[:, S: S + 4]
            span4 = (hi - lo)[0:1, 0:4] * 0.5                      # d pphys / d pn
            dpn4_adv = w_adv * dpphys * span4                      # (B, 4)

            # ---- frozen forward surrogate (eval mode; frozen params, but with
            # detach_forward=False gradients flow THROUGH it into G) -----------
            a = pn
            f_saved = []  # (input, t - mu, ivar, pre-activation) per layer
            for li in range(5):
                fw, fb, fg, fbe = frozen[4 * li: 4 * li + 4]
                if li == 0:
                    # input layer: 4 true param rows -> VPU outer-product sum
                    t = fb[0:1, :] + sum(
                        a[:, k:k + 1] * fw[k:k + 1, :] for k in range(4)
                    )
                else:
                    t = mm(a, fw[:, :]) + fb[0:1, :]
                mu = jnp.mean(t, axis=-1, keepdims=True)
                var = jnp.maximum(   # flax-exact clamp, see BN comment above
                    0.0, jnp.mean(t * t, axis=-1, keepdims=True) - mu * mu
                )
                ivar = jax.lax.rsqrt(var + _LN_EPS)
                tc = t - mu
                ln = tc * ivar * fg[0:1, :] + fbe[0:1, :]
                f_saved.append((a, tc, ivar, ln))
                a = jnp.where(ln >= 0.0, ln, _SLOPE * ln)
            fw6s, fb6s, fw6m, fb6m = frozen[20:24]
            recon = mm(a, fw6s[:]) + fb6s[0:1, :]                  # (B, W) pads 0
            # metrics head (transposed storage): 8 VPU lane-reductions
            pmet_full = jnp.broadcast_to(fb6m[0:1, :], (B, LANE))  # pads 0
            for k in range(8):
                pmk = jnp.sum(a * fw6m[k:k + 1, :], axis=1, keepdims=True)
                pmet_full = pmet_full + jnp.where(blane == k, pmk, 0.0)
            pmet = pmet_full[:, 0:8]

            recon_l = jnp.sum((recon - spectra) ** 2) / (B * S)
            met_l = jnp.sum((pmet - metrics_nm) ** 2) / (B * 8)
            d1 = recon[:, 1:] - recon[:, :-1]
            d2 = d1[:, 1:] - d1[:, :-1]                            # (B, W-2)
            mlane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
            maxwell_l = jnp.sum(jnp.where(mlane < S - 2, d2 * d2, 0.0)) / (B * (S - 2))
            f1, f2 = pmet[:, 0:1], pmet[:, 1:2]
            pn4 = pn[:, 0:4]
            th1 = 0.4 * pn4[:, 0:1] + 0.6 * pn4[:, 2:3]
            th2 = 0.3 * pn4[:, 1:2] + 0.7 * pn4[:, 3:4]
            lc_l = jnp.mean((f1 - th1) ** 2) + jnp.mean((f2 - th2) ** 2)
            # range/violation reductions masked to the 4 REAL parameter lanes:
            # padded lanes hold tanh(0)=0, which only drops out of the penalty
            # while range_lo <= 0 <= range_hi — masking keeps any window exact
            in_lane = blane < 4
            below = jnp.where(in_lane, jnp.maximum(r_lo - pn, 0.0), 0.0)
            above = jnp.where(in_lane, jnp.maximum(pn - r_hi, 0.0), 0.0)
            range_l = jnp.sum(below * below + above * above) / (B * 4)
            bad = jnp.max(
                jnp.where(in_lane, ((pn < r_lo) | (pn > r_hi)).astype(jnp.float32), 0.0),
                axis=1, keepdims=True,
            )
            viol = jnp.mean(bad)

            # ---- enhanced constraint loss (ops/losses.py enhanced_constraint_
            # loss; unified_constraint_trainer.py:295-347), annealed by the
            # per-epoch c_scale stream ---------------------------------------
            if w_constraint:
                oor = jnp.maximum(jnp.maximum(pn4 - 1.0, -pn4), 0.0)     # (B, 4)
                hard = jnp.sum(oor * oor) / B
                bdist = jnp.minimum(pn4, 1.0 - pn4)
                bexp = jnp.exp(jnp.minimum(-20.0 * bdist, 25.0))
                boundary = jnp.sum(bexp) / B
                dpar = pn4[:, 1:] - pn4[:, :-1]                          # (B, 3)
                smooth = jnp.sum(jnp.abs(dpar)) / (B * 3)
                # NaN/Inf validity of the surrogate spectrum (stop-gradient in
                # the XLA path too); pads are finite zeros -> no contribution.
                # isinf-exact (== inf, not a near-overflow threshold) so the
                # kernel and ops/losses.py agree on every finite value
                bad_r = (recon != recon) | (jnp.abs(recon) == jnp.inf)
                validity = jnp.sum(bad_r.astype(jnp.float32)) / B
                c_loss = (
                    10.0 * hard + 0.1 * boundary + 0.05 * smooth + 3.0 * validity
                )
            else:
                c_loss = 0.0

            # ---- physics window loss (steps.py:443-447 invocation of
            # ops/losses.py physics_window_loss with consistency_weight=0,
            # window_weight=1): SUM over batch of relu(f1 - f_hi) +
            # relu(f_lo - f1) on the first predicted metric ------------------
            if w_window:
                window_l = jnp.sum(
                    jnp.maximum(f1 - _F_HI, 0.0) + jnp.maximum(_F_LO - f1, 0.0)
                )
            else:
                window_l = 0.0

            # ---- stability loss (steps.py:448-457): re-predict under input
            # noise; second G pass on the pre-noised stream (exact XLA keys),
            # MSE between the two predictions.  Gradients flow through BOTH
            # passes; the noisy pass's batch stats are discarded like the
            # cycle pass's --------------------------------------------------
            if use_stab:
                noisy = stab_ref[step_k]                                # (B, W)
                u1s = mm(noisy, g_w1[0]) + g_b1[0]
                mu1s = jnp.mean(u1s, axis=0, keepdims=True)
                var1s = jnp.maximum(
                    0.0, jnp.mean(u1s * u1s, axis=0, keepdims=True) - mu1s * mu1s
                )
                iv1s = jax.lax.rsqrt(var1s + _BN_EPS)
                xh1s = (u1s - mu1s) * iv1s
                y1s = xh1s * g_gam1[0] + g_bet1[0]
                a1s = jnp.maximum(y1s, 0.0)
                u2s = mm(a1s, g_w2[0]) + g_b2[0]
                mu2s = jnp.mean(u2s, axis=0, keepdims=True)
                var2s = jnp.maximum(
                    0.0, jnp.mean(u2s * u2s, axis=0, keepdims=True) - mu2s * mu2s
                )
                iv2s = jax.lax.rsqrt(var2s + _BN_EPS)
                xh2s = (u2s - mu2s) * iv2s
                y2s = xh2s * g_gam2[0] + g_bet2[0]
                a2s = jnp.maximum(y2s, 0.0)
                z3s = jnp.broadcast_to(g_b3[0], (B, LANE))
                for k in range(4):
                    zks = jnp.sum(a2s * g_w3[0][k:k + 1, :], axis=1, keepdims=True)
                    z3s = z3s + jnp.where(blane == k, zks, 0.0)
                tns = jnp.tanh(z3s)
                pns = jax.nn.sigmoid(tns) if sigmoid else tns
                stab_diff = pn[:, 0:4] - pns[:, 0:4]               # (B, 4)
                stab_l = jnp.sum(stab_diff * stab_diff) / (B * 4)
            else:
                stab_l = 0.0

            # ---- cycle consistency G(F(G(s))) ~ G(s) (steps.py cycle_w):
            # second G pass on the surrogate spectrum, batch stats of the
            # cycled batch, running stats NOT updated (the XLA path discards
            # the cycle pass's mutated extra) ---------------------------------
            if w_cycle:
                u1c = mm(recon, g_w1[0]) + g_b1[0]
                mu1c = jnp.mean(u1c, axis=0, keepdims=True)
                var1c = jnp.maximum(
                    0.0, jnp.mean(u1c * u1c, axis=0, keepdims=True) - mu1c * mu1c
                )
                iv1c = jax.lax.rsqrt(var1c + _BN_EPS)
                xh1c = (u1c - mu1c) * iv1c
                y1c = xh1c * g_gam1[0] + g_bet1[0]
                a1c = jnp.maximum(y1c, 0.0)
                u2c = mm(a1c, g_w2[0]) + g_b2[0]
                mu2c = jnp.mean(u2c, axis=0, keepdims=True)
                var2c = jnp.maximum(
                    0.0, jnp.mean(u2c * u2c, axis=0, keepdims=True) - mu2c * mu2c
                )
                iv2c = jax.lax.rsqrt(var2c + _BN_EPS)
                xh2c = (u2c - mu2c) * iv2c
                y2c = xh2c * g_gam2[0] + g_bet2[0]
                a2c = jnp.maximum(y2c, 0.0)
                z3c = jnp.broadcast_to(g_b3[0], (B, LANE))
                for k in range(4):
                    zkc = jnp.sum(a2c * g_w3[0][k:k + 1, :], axis=1, keepdims=True)
                    z3c = z3c + jnp.where(blane == k, zkc, 0.0)
                tnc = jnp.tanh(z3c)
                pnc = jax.nn.sigmoid(tnc) if sigmoid else tnc
                cyc_diff = pnc[:, 0:4] - pn4                             # (B, 4)
                cycle_l = jnp.sum(cyc_diff * cyc_diff) / (B * 4)
            else:
                cycle_l = 0.0

            g_loss = (
                w_adv * adv + w_recon * recon_l + w_pmet * met_l
                + w_maxwell * maxwell_l + w_lc * lc_l + w_range * range_l
                + w_constraint * c_scale * c_loss + w_window * window_l
                + w_stab * stab_l + w_cycle * cycle_l
            )

            # ---- G backward ---------------------------------------------------
            g1 = w_lc * 2.0 * (th1 - f1) / B                       # (B, 1)
            g2 = w_lc * 2.0 * (th2 - f2) / B
            dpn4 = dpn4_adv + jnp.concatenate(
                [0.4 * g1, 0.3 * g2, 0.6 * g1, 0.7 * g2], axis=1
            )
            if w_constraint:
                # hand adjoint of enhanced_constraint_loss w.r.t. pn4 (validity
                # is stop-gradient).  max/min branch signs: pn-1 wins the inner
                # max iff pn > 0.5; pn wins the boundary min iff pn < 0.5.
                wcs = w_constraint * c_scale
                dhard = (2.0 * oor / B) * jnp.where(pn4 > 0.5, 1.0, -1.0)
                noclip = (-20.0 * bdist < 25.0).astype(jnp.float32)
                dbound = (
                    bexp * (-20.0) * noclip * jnp.where(pn4 < 0.5, 1.0, -1.0) / B
                )
                sgn = jnp.sign(dpar)
                zc1 = jnp.zeros((B, 1), jnp.float32)
                dsm = (
                    jnp.concatenate([zc1, sgn], axis=1)
                    - jnp.concatenate([sgn, zc1], axis=1)
                ) / (B * 3)
                dpn4 = dpn4 + wcs * (10.0 * dhard + 0.1 * dbound + 0.05 * dsm)
            if use_stab:
                # stability adjoint: mse(pn4, pns4) reaches G through BOTH
                # passes — the main chain via pn4 and the noisy pass via its
                # own full BN backward (weight grads accumulate; the input
                # gradient lands on the noise stream and is discarded)
                dstab = w_stab * 2.0 * stab_diff / (B * 4)         # d/d pn4
                dpn4 = dpn4 + dstab
                dsqs = pns[:, 0:4] * (1.0 - pns[:, 0:4]) if sigmoid else 1.0
                dz3s4 = -dstab * dsqs * (1.0 - tns[:, 0:4] * tns[:, 0:4])
                dz3s = jnp.concatenate(
                    [dz3s4, jnp.zeros((B, LANE - 4), jnp.float32)], axis=1
                )
                sWg3 = sum(
                    jnp.where(
                        row8 == k,
                        jnp.sum(a2s * dz3s[:, k:k + 1], axis=0, keepdims=True),
                        0.0,
                    ) for k in range(4)
                )
                sbg3 = csum(dz3s)
                da2s = sum(
                    dz3s[:, k:k + 1] * g_w3[0][k:k + 1, :] for k in range(4)
                )
                dy2s = da2s * (y2s > 0.0).astype(jnp.float32)
                sgam2 = csum(dy2s * xh2s)
                sbet2 = csum(dy2s)
                dt2s = dy2s * g_gam2[0] * iv2s
                dvar2s = csum(
                    dy2s * g_gam2[0] * (u2s - mu2s)
                ) * (-0.5) * iv2s * iv2s * iv2s
                du2s = (
                    dt2s - jnp.mean(dt2s, axis=0, keepdims=True)
                    + dvar2s * 2.0 * (u2s - mu2s) / B
                )
                sWg2 = dotT0(a1s, du2s)
                sbg2 = csum(du2s)
                da1s = dotT1(du2s, g_w2[0])
                dy1s = da1s * (y1s > 0.0).astype(jnp.float32)
                sgam1 = csum(dy1s * xh1s)
                sbet1 = csum(dy1s)
                dt1s = dy1s * g_gam1[0] * iv1s
                dvar1s = csum(
                    dy1s * g_gam1[0] * (u1s - mu1s)
                ) * (-0.5) * iv1s * iv1s * iv1s
                du1s = (
                    dt1s - jnp.mean(dt1s, axis=0, keepdims=True)
                    + dvar1s * 2.0 * (u1s - mu1s) / B
                )
                sWg1 = dotT0(noisy, du1s)
                sbg1 = csum(du1s)

            if w_cycle:
                # cycle adjoint: first-arg path into pn4 directly; second-arg
                # path backprops the SECOND G pass (weight grads accumulate
                # into the main-chain grads below; the input gradient reaches
                # recon only when gradients flow through F, i.e. not detach)
                dcyc2 = w_cycle * 2.0 * cyc_diff / (B * 4)         # d/d pnc4
                dpn4 = dpn4 - dcyc2
                dsqc = pnc[:, 0:4] * (1.0 - pnc[:, 0:4]) if sigmoid else 1.0
                dz3c4 = dcyc2 * dsqc * (1.0 - tnc[:, 0:4] * tnc[:, 0:4])
                dz3c = jnp.concatenate(
                    [dz3c4, jnp.zeros((B, LANE - 4), jnp.float32)], axis=1
                )
                cWg3 = sum(
                    jnp.where(
                        row8 == k,
                        jnp.sum(a2c * dz3c[:, k:k + 1], axis=0, keepdims=True),
                        0.0,
                    ) for k in range(4)
                )
                cbg3 = csum(dz3c)
                da2c = sum(
                    dz3c[:, k:k + 1] * g_w3[0][k:k + 1, :] for k in range(4)
                )
                dy2c = da2c * (y2c > 0.0).astype(jnp.float32)
                cgam2 = csum(dy2c * xh2c)
                cbet2 = csum(dy2c)
                dt2c = dy2c * g_gam2[0] * iv2c
                dvar2c = csum(
                    dy2c * g_gam2[0] * (u2c - mu2c)
                ) * (-0.5) * iv2c * iv2c * iv2c
                du2c = (
                    dt2c - jnp.mean(dt2c, axis=0, keepdims=True)
                    + dvar2c * 2.0 * (u2c - mu2c) / B
                )
                cWg2 = dotT0(a1c, du2c)
                cbg2 = csum(du2c)
                da1c = dotT1(du2c, g_w2[0])
                dy1c = da1c * (y1c > 0.0).astype(jnp.float32)
                cgam1 = csum(dy1c * xh1c)
                cbet1 = csum(dy1c)
                dt1c = dy1c * g_gam1[0] * iv1c
                dvar1c = csum(
                    dy1c * g_gam1[0] * (u1c - mu1c)
                ) * (-0.5) * iv1c * iv1c * iv1c
                du1c = (
                    dt1c - jnp.mean(dt1c, axis=0, keepdims=True)
                    + dvar1c * 2.0 * (u1c - mu1c) / B
                )
                cWg1 = dotT0(recon, du1c)
                cbg1 = csum(du1c)
                drecon_c = dotT1(du1c, g_w1[0])                    # (B, W)
            dpn = jnp.concatenate(
                [dpn4, jnp.zeros((B, LANE - 4), jnp.float32)], axis=1
            )
            dpn = dpn + jnp.where(
                blane < 4, w_range * (2.0 * above - 2.0 * below) / (B * 4), 0.0
            )

            if not detach:
                # gradients through the frozen surrogate (unified_trainer
                # semantics): recon-MSE, metrics-MSE, Maxwell and the lc f-side
                # all reach G via F's input.
                met_pad = met_ref[step_k]
                dmet = jnp.where(
                    blane < 8, w_pmet * 2.0 * (pmet_full - met_pad) / (B * 8), 0.0
                )
                dmet = dmet + jnp.where(blane == 0, w_lc * 2.0 * (f1 - th1) / B, 0.0)
                dmet = dmet + jnp.where(blane == 1, w_lc * 2.0 * (f2 - th2) / B, 0.0)
                if w_window:
                    # window adjoint (batch SUM, no /B): relu'(f1-hi) -
                    # relu'(lo-f1), strict at the kink like jax.nn.relu
                    dwin = w_window * (
                        (f1 > _F_HI).astype(jnp.float32)
                        - (f1 < _F_LO).astype(jnp.float32)
                    )
                    dmet = dmet + jnp.where(blane == 0, dwin, 0.0)
                drecon = w_recon * 2.0 * (recon - spectra) / (B * S)
                # maxwell adjoint: d/ds_k of mean(d2^2) with d2_j = s_j - 2 s_{j+1}
                # + s_{j+2}; with m = masked d2, ds = c*(m_k - 2 m_{k-1} + m_{k-2})
                d2m = jnp.where(mlane < S - 2, d2, 0.0)
                d2p = jnp.concatenate(
                    [d2m, jnp.zeros((B, 2), jnp.float32)], axis=1
                )                                                  # (B, W)
                zcol = jnp.zeros((B, 1), jnp.float32)
                sh1 = jnp.concatenate([zcol, d2p[:, : W - 1]], axis=1)
                sh2 = jnp.concatenate([zcol, zcol, d2p[:, : W - 2]], axis=1)
                coef = w_maxwell * 2.0 / (B * (S - 2))
                drecon = drecon + coef * (d2p - 2.0 * sh1 + sh2)
                if w_cycle:
                    # cycle's second G pass reads recon: its input gradient
                    # joins the physics terms before the F backward
                    drecon = drecon + drecon_c
                da = dotT1(drecon, fw6s[:]) + sum(
                    dmet[:, k:k + 1] * fw6m[k:k + 1, :] for k in range(8)
                )                                                  # (B, 256)
                for li in range(4, -1, -1):
                    fw, _, fg, _ = frozen[4 * li: 4 * li + 4]
                    a_in, tc, ivar, ln = f_saved[li]
                    dy = da * leaky_mask(ln)
                    dxh = dy * fg[0:1, :]
                    c_dim = tc.shape[1]
                    dvar = jnp.sum(
                        dxh * tc, axis=-1, keepdims=True
                    ) * (-0.5) * ivar * ivar * ivar
                    dt = dxh * ivar
                    dt = dt - jnp.mean(dt, axis=-1, keepdims=True) + dvar * 2.0 * tc / c_dim
                    if li == 0:
                        # transposed input layer: dx = dt W^T -> 4 VPU rowsums
                        da = sum(
                            jnp.where(
                                blane == k,
                                jnp.sum(dt * fw[k:k + 1, :], axis=1, keepdims=True),
                                0.0,
                            ) for k in range(4)
                        )
                    else:
                        da = dotT1(dt, fw[:, :])
                dpn = dpn + da                                     # F input == pn

            dsq = pn * (1.0 - pn) if sigmoid else 1.0
            dz3 = dpn * dsq * (1.0 - tn * tn)
            # transposed-head backward (dz3 is zero beyond lane 4 — dpn4,
            # the masked range term, and F's zero-padded input rows all stop
            # at lane 4): 4 VPU reductions/broadcasts replace 2 MXU ops
            dWg3 = sum(
                jnp.where(
                    row8 == k,
                    jnp.sum(a2 * dz3[:, k:k + 1], axis=0, keepdims=True),
                    0.0,
                ) for k in range(4)
            )                                                      # (8, 256)
            dbg3 = csum(dz3)
            da2 = sum(dz3[:, k:k + 1] * g_w3[0][k:k + 1, :] for k in range(4))
            dy2 = da2 * (y2 > 0.0).astype(jnp.float32)
            dgam2 = csum(dy2 * xh2)
            dbet2 = csum(dy2)
            dt2 = dy2 * g_gam2[0] * iv2
            dvar2 = csum(dy2 * g_gam2[0] * (u2 - mu2)) * (-0.5) * iv2 * iv2 * iv2
            du2 = dt2 - jnp.mean(dt2, axis=0, keepdims=True) + dvar2 * 2.0 * (u2 - mu2) / B
            dWg2 = dotT0(a1, du2)
            dbg2 = csum(du2)
            da1 = dotT1(du2, g_w2[0])
            dy1 = da1 * (y1 > 0.0).astype(jnp.float32)
            dgam1 = csum(dy1 * xh1)
            dbet1 = csum(dy1)
            dt1 = dy1 * g_gam1[0] * iv1
            dvar1 = csum(dy1 * g_gam1[0] * (u1 - mu1)) * (-0.5) * iv1 * iv1 * iv1
            du1 = dt1 - jnp.mean(dt1, axis=0, keepdims=True) + dvar1 * 2.0 * (u1 - mu1) / B
            dWg1 = dotT0(spectra, du1)
            dbg1 = csum(du1)
            if w_cycle:
                # G's params are used by BOTH passes: grads accumulate
                dWg1, dbg1 = dWg1 + cWg1, dbg1 + cbg1
                dgam1, dbet1 = dgam1 + cgam1, dbet1 + cbet1
                dWg2, dbg2 = dWg2 + cWg2, dbg2 + cbg2
                dgam2, dbet2 = dgam2 + cgam2, dbet2 + cbet2
                dWg3, dbg3 = dWg3 + cWg3, dbg3 + cbg3
            if use_stab:
                dWg1, dbg1 = dWg1 + sWg1, dbg1 + sbg1
                dgam1, dbet1 = dgam1 + sgam1, dbet1 + sbet1
                dWg2, dbg2 = dWg2 + sWg2, dbg2 + sbg2
                dgam2, dbet2 = dgam2 + sgam2, dbet2 + sbet2
                dWg3, dbg3 = dWg3 + sWg3, dbg3 + sbg3
            adam_apply(
                [g_w1, g_b1, g_gam1, g_bet1, g_w2, g_b2, g_gam2, g_bet2,
                 g_w3, g_b3],
                [dWg1, dbg1, dgam1, dbet1, dWg2, dbg2, dgam2, dbet2, dWg3, dbg3],
                lr_g, inv1_g, inv2_g,
                gate=live,
            )

            if ema:
                # generator EMA track (steps.py:474-484): lerp of the JUST-
                # updated params; zero-padded areas stay exactly zero.  EMA
                # bufs are packed (1, r, c).
                g_bufs = (g_w1, g_b1, g_gam1, g_bet1, g_w2, g_b2, g_gam2,
                          g_bet2, g_w3, g_b3)
                for eref, gref in zip(ema_bufs, g_bufs):
                    lerped = mu_ema * eref[0] + (1.0 - mu_ema) * gref[0]
                    eref[0] = (
                        lerped if not padded
                        else jnp.where(live > 0.0, lerped, eref[0])
                    )

            # BN running stats (flax: momentum * ra + (1 - momentum) * batch)
            upd = (
                (lambda ref, j, x: x) if not padded
                else (lambda ref, j, x: jnp.where(live > 0.0, x, ref[j]))
            )
            st1[0] = upd(st1, 0, _BN_MOM * st1[0] + (1.0 - _BN_MOM) * mu1)
            st1[1] = upd(st1, 1, _BN_MOM * st1[1] + (1.0 - _BN_MOM) * var1)
            st2[0] = upd(st2, 0, _BN_MOM * st2[0] + (1.0 - _BN_MOM) * mu2)
            st2[1] = upd(st2, 1, _BN_MOM * st2[1] + (1.0 - _BN_MOM) * var2)

            # ---- per-epoch metric means --------------------------------------
            vals = (d_loss, g_loss, d_acc, adv, recon_l, met_l, maxwell_l,
                    lc_l, range_l, viol)
            if w_constraint:
                vals = vals + (c_loss,)  # unscaled, like the XLA aux entry
            if _DEBUG_LANES:
                vals = vals + (
                    jnp.sum(jnp.abs(spectra)), jnp.sum(jnp.abs(params_phys)),
                    jnp.sum(jnp.abs(u1)), jnp.min(var1), jnp.sum(jnp.abs(pn)),
                    jnp.sum(jnp.abs(x0)), jnp.sum(jnp.abs(p1)),
                    jnp.sum(jnp.abs(z)), jnp.sum(jnp.abs(d_w1[0])),
                    jnp.sum(jnp.abs(d_w1[1])), jnp.sum(jnp.abs(d_w1[2])),
                    jnp.sum(jnp.abs(g_w1[0])), jnp.sum(jnp.abs(recon)),
                    lr_g, inv2_g, jnp.sum(jnp.abs(sched_row)),
                )
            mlane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
            mrow = jnp.zeros((1, LANE), jnp.float32)
            for k, v in enumerate(vals):
                mrow = jnp.where(mlane1 == k, v, mrow)
            if padded:
                # padded tail steps contribute exact zeros to the epoch row
                mrow = mrow * live
            return mrow

        if members == 1:
            solo = (train, stats, ema_bufs, spec_ref, par_ref, met_ref,
                    inoise_ref, stab_ref, eps_ref)
            mrow = _one_step(0, *solo)
            for _k in range(1, pack):
                mrow = mrow + _one_step(_k, *solo)
            if _DEBUG_PER_STEP:
                metrics_ref[0] = mrow
                return
            mrow = mrow / steps_per_epoch
            rs_g = rs // pack

            @pl.when(i % rs_g == 0)
            def _():
                metrics_ref[0] = mrow

            @pl.when(i % rs_g != 0)
            def _():
                metrics_ref[0] = metrics_ref[0] + mrow
            return

        # members > 1: every buffer and per-member stream carries a
        # leading M axis; run the SAME step body once per member through
        # _MemberView-wrapped refs.  The members' op chains within a grid
        # step are fully independent — the latency-headroom bet is that
        # Mosaic's scheduler overlaps them (the solo step is latency-
        # bound at 16.5% MFU; bench.py utilization fields).
        def _wrap(r, m):
            return None if r is None else _MemberView(r, m)

        views = [
            ([_MemberView(r, m) for r in train],
             [_MemberView(r, m) for r in stats],
             [_MemberView(r, m) for r in ema_bufs],
             _MemberView(spec_ref, m), _MemberView(par_ref, m),
             _MemberView(met_ref, m), _wrap(inoise_ref, m),
             _wrap(stab_ref, m), _wrap(eps_ref, m))
            for m in range(members)
        ]
        mrows = [_one_step(0, *views[m]) for m in range(members)]
        for _k in range(1, pack):
            for m in range(members):
                mrows[m] = mrows[m] + _one_step(_k, *views[m])
        mrows = [r / steps_per_epoch for r in mrows]
        rs_g = rs // pack

        @pl.when(i % rs_g == 0)
        def _():
            for m in range(members):
                metrics_ref[0, m:m + 1] = mrows[m]

        @pl.when(i % rs_g != 0)
        def _():
            for m in range(members):
                metrics_ref[0, m:m + 1] = metrics_ref[0, m:m + 1] + mrows[m]

    return kernel


def _build_streams(cfg, settings, k_d, g_sched_of, d_sched_of,
                   rng, step, g_count, d_count, ds, key, scales):
    """Gather/schedule/noise stream construction (the XLA prologue) —
    compiled as its OWN jitted program: fusing it with the aliased
    pallas_call corrupts the kernel's VMEM operands on v5e (the
    round-3 forward root cause; the GAN kernel's grid caps were
    measured under the same fused shape — _FUSED_PROLOGUE note).

    Module-level so every GAN-kernel driver (the Trainer's
    make_pallas_multi_epoch_fn, the sub-epoch driver, and the
    member-packed ensemble factory) shares ONE stream recipe;
    g_sched_of/d_sched_of map spe -> the optax schedule callables
    (the factories own the override policy).  Returns
    (spec, par, met, sched, *extra_noise_streams, lo, hi)."""
    B = cfg.train.batch_size
    S = cfg.data.spectrum_dim
    W = _up(S + 4)
    use_aug = (
        float(settings.augment_noise) > 0.0
        or float(settings.augment_shift) > 0.0
        or float(settings.augment_scale) > 0.0
    )
    use_inoise = float(settings.instance_noise) > 0.0
    use_stab = float(settings.stability_w) > 0.0
    wgan = settings.gan_loss == "wgan_gp"

    E = scales.shape[0]
    N = ds.spectra.shape[0]
    spe = max(1, N // B)
    T = E * spe
    # divisor-less spe (e.g. prime) pads each epoch to spe_pad gated
    # steps (see _launch_plan) — streams gain zero-filled tail slots
    # per epoch and the sched stream carries a `live` lane the kernel
    # gates every state update and metric contribution on
    _, _, plan_rs, spe_pad = _launch_plan(E, spe)
    pad = spe_pad - spe

    def _pad_steps(x):
        if pad == 0:
            return x
        x = x.reshape((E, spe) + x.shape[1:])
        widths = ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2)
        return jnp.pad(x, widths).reshape((E * spe_pad,) + x.shape[2:])
    g_sched = g_sched_of(spe)
    d_sched = d_sched_of(spe)

    keys = jax.random.split(key, E)
    idx = jax.vmap(lambda k: epoch_indices(k, N, B))(keys).reshape(T, B)
    par_g = jnp.pad(ds.params, ((0, 0), (0, LANE - 4)))[idx]
    met_g = jnp.pad(ds.metrics_norm, ((0, 0), (0, LANE - 8)))[idx]

    extra_streams = ()
    if use_aug or use_inoise or use_stab or wgan:
        # per-step keys from the EXACT rng chain the XLA step splits
        # (steps.py:257-259; unpack_state advances the same chain), so
        # every stochastic stream is bitwise-identical to the XLA run
        def _collect(r, _):
            ks = jax.random.split(r, 9)
            # k_noise, k_aug, k_in, k_gp
            return ks[0], (ks[5], ks[6], ks[7], ks[8])

        _, (k_noise_t, k_aug_t, k_in_t, k_gp_t) = jax.lax.scan(
            _collect, rng, None, length=T
        )
    if use_aug:
        from .augment import augment_spectra

        raw = ds.spectra[idx]                               # (T, B, S)
        raw = jax.vmap(
            lambda k, sp: augment_spectra(
                k, sp,
                noise_level=settings.augment_noise,
                freq_shift=settings.augment_shift,
                amp_scale=settings.augment_scale,
            )
        )(k_aug_t, raw)
        spec_g = jnp.pad(raw, ((0, 0), (0, 0), (0, W - S)))
    else:
        spec_g = jnp.pad(ds.spectra, ((0, 0), (0, W - S)))[idx]    # (T,B,W)
    if use_inoise:
        sig = float(settings.instance_noise)
        inoise = jax.vmap(
            lambda k: sig * jax.random.normal(k, (2 * B, S))
        )(k_in_t)
        extra_streams += (jnp.pad(inoise, ((0, 0), (0, 0), (0, W - S))),)
    if use_stab:
        sig = float(settings.stability_noise)
        stab_noise = jax.vmap(
            lambda k: sig * jax.random.normal(k, (B, S))
        )(k_noise_t)
        # noise on top of the (possibly augmented) spectrum stream —
        # steps.py noises the post-augment spectra; pads stay zero
        extra_streams += (spec_g.at[:, :, :S].add(stab_noise),)
    if wgan:
        # GP interpolation coefficients (steps.py:316) in lane 0
        eps_t = jax.vmap(
            lambda k: jax.random.uniform(k, (B, 1))
        )(k_gp_t)
        extra_streams += (jnp.pad(eps_t, ((0, 0), (0, 0), (0, LANE - 1))),)

    # per-OPTIMIZER counts: G and D can disagree after mixed-phase
    # histories (e.g. a d_update_every>1 phase) — and with skips, D's
    # count advances only on its actual update steps (XLA skip-branch
    # parity: the whole d_opt is untouched on skipped steps)
    if k_d > 1:
        d_mask = ((step + jnp.arange(T)) % k_d == 0).astype(jnp.float32)
        upd_before = (jnp.cumsum(d_mask) - d_mask).astype(d_count.dtype)
    else:
        d_mask = jnp.ones((T,), jnp.float32)
        upd_before = jnp.arange(T, dtype=d_count.dtype)
    tg = g_count + jnp.arange(T)
    td = d_count + upd_before
    tgf = (tg + 1).astype(jnp.float32)
    tdf = (td + 1).astype(jnp.float32)
    lanes = [
        g_sched(tg), d_sched(td),
        1.0 / (1.0 - jnp.power(_B1, tgf)),
        1.0 / (1.0 - jnp.power(_B2, tgf)),
        1.0 / (1.0 - jnp.power(_B1, tdf)),
        1.0 / (1.0 - jnp.power(_B2, tdf)),
        d_mask,
        jnp.repeat(scales.astype(jnp.float32), spe),
        jnp.ones((T,), jnp.float32),   # `live` gate (0 on padded tail)
    ]
    # zero-pad every lane per epoch: padded steps get lr/inv/d_mask/
    # live all 0 — the kernel's gated updates never consume them
    lanes = [_pad_steps(v) for v in lanes]
    Tp = E * spe_pad
    sched = jnp.stack(
        lanes + [jnp.zeros((Tp,), jnp.float32)] * (LANE - len(lanes)),
        axis=1,
    )
    sched = sched.reshape(Tp, 1, LANE)  # unit middle axis: TPU block
    # shapes need the last two dims (8,128)-divisible or array-equal

    lo = jnp.pad(ds.param_lo, (0, LANE - 4)).reshape(1, LANE)
    hi = jnp.pad(ds.param_hi, (0, LANE - 4)).reshape(1, LANE)
    data_streams = tuple(
        _pad_steps(s) for s in (spec_g, par_g, met_g) + extra_streams
    )
    return data_streams[:3] + (sched,) + data_streams[3:] + (lo, hi)


# ---------------------------------------------------------------------------
# Builder: drop-in replacement for make_multi_epoch_fn
# ---------------------------------------------------------------------------


def make_pallas_multi_epoch_fn(
    cfg: PiGanConfig, settings, *, lr_g: float | None = None,
    lr_d: float | None = None, schedule_g: str | None = None,
    schedule_d: str | None = None, horizon_epochs: int | None = None,
    interpret: bool = False,
):
    """multi_epoch(state, ds, key, scales) -> (state, per-epoch metrics) —
    same contract as train.steps.make_multi_epoch_fn(step, bs,
    with_scale=True) for configurations inside `supports_megakernel`.
    `scales` is the per-epoch constraint annealing multiplier (streamed
    into the kernel; only consumed when settings.constraint_w > 0).

    lr_g/lr_d/schedule_g/schedule_d mirror Trainer.train_pigan's per-phase
    optimizer policy overrides (an overridden optimizer's schedule spans
    `horizon_epochs`, the phase length, and its Adam state is freshly
    initialized Trainer-side); with no overrides the state's optimizers
    must be the make_optimizers defaults (cosine G / step D, lr from cfg)
    — Trainer guards this."""
    reason = supports_megakernel(cfg, settings)
    if reason is not None:
        raise ValueError(f"megakernel unsupported here: {reason}")
    g_overridden = lr_g is not None or schedule_g is not None
    d_overridden = lr_d is not None or schedule_d is not None
    if (g_overridden or d_overridden) and horizon_epochs is None:
        raise ValueError("optimizer overrides need horizon_epochs")
    S = cfg.data.spectrum_dim
    B = cfg.train.batch_size
    W = _up(S + 4)
    clip = float(cfg.train.grad_clip)
    k_d = int(settings.d_update_every)
    use_ema = float(settings.ema_decay) > 0.0
    use_aug = (
        float(settings.augment_noise) > 0.0
        or float(settings.augment_shift) > 0.0
        or float(settings.augment_scale) > 0.0
    )
    use_inoise = float(settings.instance_noise) > 0.0
    use_stab = float(settings.stability_w) > 0.0
    wgan = settings.gan_loss == "wgan_gp"

    def _mk_sched(kind: str, lr: float, total_epochs: int, spe: int):
        # the shared dispatch owns the default schedule parameters, so the
        # kernel's precomputed LR streams can never drift from optax's
        from ..train.schedules import make_schedule

        return make_schedule(kind, lr, total_epochs, spe)

    def _g_sched_of(spe: int):
        if g_overridden:
            return _mk_sched(
                schedule_g or "cosine",
                cfg.train.lr_g if lr_g is None else lr_g, horizon_epochs, spe,
            )
        return cosine_schedule(cfg.train.lr_g, cfg.train.num_epochs, spe, 0.01)

    def _d_sched_of(spe: int):
        if d_overridden:
            return _mk_sched(
                schedule_d or "step",
                cfg.train.lr_d if lr_d is None else lr_d, horizon_epochs, spe,
            )
        return step_schedule(cfg.train.lr_d, cfg.train.num_epochs, spe, 0.5, 0.25)

    def _streams(rng, step, g_count, d_count, ds, key: jax.Array,
                 scales: jax.Array):
        """See _build_streams (shared stream recipe; split-prologue note)."""
        return _build_streams(
            cfg, settings, k_d, _g_sched_of, _d_sched_of,
            rng, step, g_count, d_count, ds, key, scales,
        )

    def _kernel_body(state, E: int, spe: int, *streams):
        T = E * spe
        plan_ls, _, plan_rs, spe_pad = _launch_plan(E, spe)
        pad = spe_pad - spe
        *step_streams, lo, hi = streams
        sched = step_streams[3]
        if k_d > 1:
            # D's actual update count this call = the live steps whose
            # d_mask lane is 1 (padded tail rows stream d_mask 0)
            d_inc = jnp.sum(sched[:, 0, 6]).astype(
                state.d_opt[1][0].count.dtype)
        else:
            d_inc = None
        train, stats, frozen = pack_state(
            state, S, frozen_bf16=cfg.train.compute_dtype == "bfloat16"
        )
        if use_ema:
            if state.g_ema is None:
                raise ValueError(
                    "StepSettings.ema_decay > 0 requires a state carrying "
                    "g_ema — init with init_pigan_state(..., ema=True) "
                    "(Trainer does this automatically)"
                )
            stats = stats + pack_ema(state, S)

        const = lambda shape: pl.BlockSpec(  # noqa: E731 — whole-array block
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )
        n_state = len(train) + len(stats)
        n_extra = int(use_inoise) + int(use_stab) + int(wgan)
        aliases = {} if _NO_ALIAS else {
            30 + n_extra + k: k for k in range(n_state)
        }
        pack = 1 if _DEBUG_PER_STEP else _resolve_pack(plan_ls, plan_rs)
        kernel = _make_kernel(
            S, B, spe, settings, clip,
            bf16=cfg.train.compute_dtype == "bfloat16",
            row_steps=plan_rs, padded=pad > 0, pack=pack,
        )

        def launch(bufs, streams, n_steps, rsl):
            spec_c, par_c, met_c, sched_c, *extra_c = streams
            row = lambda *shape: pl.BlockSpec(  # noqa: E731 — pack-step block
                (pack,) + shape, lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
            in_specs = (
                [row(B, W), row(B, LANE), row(B, LANE), row(1, LANE)]
                + ([row(2 * B, W)] if use_inoise else [])
                + ([row(B, W)] if use_stab else [])
                + ([row(B, LANE)] if wgan else [])
                + [const((1, LANE)), const((1, LANE))]
                + [const(f.shape) for f in frozen]
                + [const(b.shape) for b in bufs]
            )
            n_rows = n_steps if _DEBUG_PER_STEP else n_steps // rsl
            midx = (lambda i: (i, 0, 0)) if _DEBUG_PER_STEP else (
                lambda i: (i // (rsl // pack), 0, 0))
            out_specs = (
                [const(b.shape) for b in bufs]
                + [pl.BlockSpec((1, 1, LANE), midx, memory_space=pltpu.VMEM)]
            )
            out_shape = (
                [jax.ShapeDtypeStruct(b.shape, b.dtype) for b in bufs]
                + [jax.ShapeDtypeStruct((n_rows, 1, LANE), jnp.float32)]
            )
            outs = pl.pallas_call(
                kernel,
                grid=(n_steps // pack,),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                input_output_aliases=aliases,
                interpret=interpret,
                **({} if interpret else dict(
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 2**20,
                    ))),
            )(spec_c, par_c, met_c, sched_c, *extra_c, lo, hi, *frozen, *bufs)
            return tuple(outs[:n_state]), outs[n_state]

        bufs, mrows = _chunked_launch(
            launch, train + stats, tuple(step_streams), E, spe,
        )
        train_out = bufs[:16]
        stats_out = bufs[16:18]
        ema_out = bufs[18:] if use_ema else None
        new_state = unpack_state(
            state, train_out, stats_out, T, S, d_steps=d_inc,
            ema_out=ema_out,
        )
        mkeys = METRIC_KEYS + (
            ("constraint_loss",) if settings.constraint_w else ()
        )
        metrics = {k: mrows[:, 0, j] for j, k in enumerate(mkeys)}
        if _DEBUG_LANES:
            # forensic checksum lanes (see _make_kernel's debug tuple);
            # per-epoch means like the regular metrics
            for off in range(16):
                j = len(mkeys) + off
                metrics[f"dbg_{off}"] = mrows[:, 0, j]
        return new_state, metrics

    fused_prologue = _FUSED_PROLOGUE            # captured at factory time
    stream_jit = jax.jit(_streams)
    kernel_jit = partial(jax.jit, static_argnums=(1, 2),
                         donate_argnums=(0,))(_kernel_body)

    if fused_prologue:
        # Forensic shape: prologue + kernel in ONE jitted program — the
        # shape every pre-round-3 grid-cap measurement was taken under
        # (kept only to reproduce/bisect the corruption class).
        @partial(jax.jit, donate_argnums=(0,))
        def fused(state, ds, key: jax.Array, scales: jax.Array):
            E = scales.shape[0]
            spe = max(1, ds.spectra.shape[0] // B)
            streams = _streams(
                state.rng, state.step, state.g_opt[1][0].count,
                state.d_opt[1][0].count, ds, key, scales,
            )
            return _kernel_body(state, E, spe, *streams)

    def multi_epoch(state, ds, key: jax.Array, scales: jax.Array):
        if fused_prologue:
            return fused(state, ds, key, scales)
        E = int(scales.shape[0])
        spe = max(1, ds.spectra.shape[0] // B)
        streams = stream_jit(
            state.rng, state.step, state.g_opt[1][0].count,
            state.d_opt[1][0].count, ds, key, scales,
        )
        return kernel_jit(state, E, spe, *streams)

    return multi_epoch


def make_pallas_ensemble_fn(
    cfg: PiGanConfig, settings, num_members: int, *, interpret: bool = False,
    force_large_m: bool = False,
):
    """M independent seed-ensemble members trained in ONE Pallas launch:
    every state buffer carries a leading member axis (M, 3, r, c) resident
    in VMEM together, and each grid step runs the SAME per-step body once
    per member over _MemberView-wrapped refs.

    Round-4 utilization experiment (VERDICT r3 #1): the solo kernel is
    LATENCY-bound — 16.5% MFU, 1% HBM utilization at 59.6k steps/s
    (bench.py utilization fields), with bf16 operands buying nothing and
    a ~5.9 us/grid-step orchestration floor already hidden under compute
    (RESULTS.md "Where the 17 us actually goes").  Co-locating M members
    gives the scheduler M independent per-step op chains to overlap, so
    aggregate steps/s/chip can exceed the solo rate if (and only if) the
    latency diagnosis is right.  VMEM: ~6.6 MB state per member + 5.6 MB
    shared frozen F — M <= 8 fits the 100 MB budget easily.

    Contract: ``ensemble_epoch(states, ds, key, scales) -> (states,
    metrics_list)`` where ``states`` is a LIST of M PiGanStates (every
    member must share the same step/opt counts — fresh seed-ensemble
    members, like parallel/ensemble_megakernel.py builds) and
    ``metrics_list`` has one {metric: (E,)} dict per member.  Member m's
    shuffle/noise streams derive from ``fold_in(key, m)`` and member m's
    own state.rng, making each member bit-identical to training it alone
    through make_pallas_multi_epoch_fn with key = fold_in(key, m)
    (tested in tests/test_member_packed.py).  Frozen F is taken from
    member 0 (seed ensembles share the pretrained surrogate).

    Scope: the no-override schedule defaults, ema_decay == 0, and
    E * spe_pad <= _MAX_PROGRAM_GRID (one launch per call — the
    hardware-proven program shape; callers chunk epochs like the
    Trainer does).
    """
    reason = supports_megakernel(cfg, settings)
    if reason is not None:
        raise ValueError(f"megakernel unsupported here: {reason}")
    if num_members < 1:
        raise ValueError("num_members must be >= 1")
    if num_members > _MAX_PACKED_M and not interpret and not force_large_m:
        raise ValueError(
            f"member-packed kernel: M={num_members} members in one launch "
            f"exceeds the measured compile envelope (M <= {_MAX_PACKED_M}): "
            "an M=8 compile ran past 25 minutes on v5e and was killed "
            "(RESULTS.md 'Member-packed kernel'), and long remote compiles "
            "are the TPU tunnel's RPC-drop failure mode.  Spread members "
            "over more devices, use packed=False round-robin dispatch, or "
            "pass force_large_m=True if you can afford the compile."
        )
    if float(settings.ema_decay) > 0.0:
        raise ValueError("member-packed kernel: ema_decay > 0 unsupported")
    S = cfg.data.spectrum_dim
    B = cfg.train.batch_size
    W = _up(S + 4)
    clip = float(cfg.train.grad_clip)
    k_d = int(settings.d_update_every)
    M = int(num_members)
    use_inoise = float(settings.instance_noise) > 0.0
    use_stab = float(settings.stability_w) > 0.0
    wgan = settings.gan_loss == "wgan_gp"

    def _g_sched_of(spe: int):
        return cosine_schedule(cfg.train.lr_g, cfg.train.num_epochs, spe, 0.01)

    def _d_sched_of(spe: int):
        return step_schedule(cfg.train.lr_d, cfg.train.num_epochs, spe, 0.5, 0.25)

    def _streams_all(rngs, step, g_count, d_count, ds, key, scales):
        """Per-member prologue: M stream sets stacked on a leading member
        axis (spec/par/met and the noise extras); sched/lo/hi shared
        (identical across members — same counts, same scales).  ``key``
        is one key (member m uses fold_in(key, m)) or a stacked (M, 2)
        array of explicit per-member keys (the packed seed-ensemble
        driver passes the exact chunk keys the unpacked round-robin
        driver would use, for bit-identity across drivers)."""
        def mkey(m):
            return key[m] if key.ndim == 2 else jax.random.fold_in(key, m)

        per = [
            _build_streams(
                cfg, settings, k_d, _g_sched_of, _d_sched_of,
                rngs[m], step, g_count, d_count, ds, mkey(m), scales,
            )
            for m in range(M)
        ]
        n_extra = int(use_inoise) + int(use_stab) + int(wgan)
        # M == 1 keeps the solo layout exactly (no member axis anywhere:
        # the kernel's members==1 branch IS the solo kernel)
        stack = (lambda xs: xs[0]) if M == 1 else jnp.stack
        stacked = [
            stack([p[j] for p in per])
            for j in [0, 1, 2] + list(range(4, 4 + n_extra))
        ]
        sched, lo, hi = per[0][3], per[0][-2], per[0][-1]
        return tuple(stacked[:3]) + (sched,) + tuple(stacked[3:]) + (lo, hi)

    def _kernel_body(states, E: int, spe: int, *streams):
        T = E * spe
        ls, n_launch, plan_rs, spe_pad = _launch_plan(E, spe)
        if n_launch != 1:
            raise ValueError(
                f"member-packed kernel: E*spe_pad {E * spe_pad} exceeds one "
                f"launch (_MAX_GRID={_MAX_GRID}); chunk epochs per call"
            )
        pad = spe_pad - spe
        *step_streams, lo, hi = streams
        sched = step_streams[3]
        if k_d > 1:
            d_inc = jnp.sum(sched[:, 0, 6]).astype(
                states[0].d_opt[1][0].count.dtype)
        else:
            d_inc = None
        packed = [
            pack_state(st, S, frozen_bf16=cfg.train.compute_dtype == "bfloat16")
            for st in states
        ]
        stack = (lambda xs: xs[0]) if M == 1 else jnp.stack
        train = [
            stack([pk[0][j] for pk in packed]) for j in range(16)
        ]
        stats = [stack([pk[1][j] for pk in packed]) for j in range(2)]
        frozen = packed[0][2]          # shared pretrained F (member 0)
        bufs = train + stats

        const = lambda shape: pl.BlockSpec(  # noqa: E731 — whole-array block
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )
        n_state = len(bufs)
        n_extra = len(step_streams) - 4
        aliases = {} if _NO_ALIAS else {
            30 + n_extra + k: k for k in range(n_state)
        }
        pack = _resolve_pack(ls, plan_rs)
        kernel = _make_kernel(
            S, B, spe, settings, clip,
            bf16=cfg.train.compute_dtype == "bfloat16",
            row_steps=plan_rs, padded=pad > 0, pack=pack, members=M,
        )

        spec_c, par_c, met_c, sched_c, *extra_c = step_streams
        if M == 1:
            mrow = lambda *shape: pl.BlockSpec(  # noqa: E731 — solo stream
                (pack,) + shape, lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        else:
            mrow = lambda *shape: pl.BlockSpec(  # noqa: E731 — member block
                (M, pack) + shape, lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        in_specs = (
            [mrow(B, W), mrow(B, LANE), mrow(B, LANE),
             pl.BlockSpec((pack, 1, LANE), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)]
            + ([mrow(2 * B, W)] if use_inoise else [])
            + ([mrow(B, W)] if use_stab else [])
            + ([mrow(B, LANE)] if wgan else [])
            + [const((1, LANE)), const((1, LANE))]
            + [const(f.shape) for f in frozen]
            + [const(b.shape) for b in bufs]
        )
        n_rows = ls // plan_rs
        midx = lambda i: (i // (plan_rs // pack), 0, 0)  # noqa: E731
        out_specs = (
            [const(b.shape) for b in bufs]
            + [pl.BlockSpec((1, M, LANE), midx, memory_space=pltpu.VMEM)]
        )
        out_shape = (
            [jax.ShapeDtypeStruct(b.shape, b.dtype) for b in bufs]
            + [jax.ShapeDtypeStruct((n_rows, M, LANE), jnp.float32)]
        )
        outs = pl.pallas_call(
            kernel,
            grid=(ls // pack,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            input_output_aliases=aliases,
            interpret=interpret,
            **({} if interpret else dict(
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 2**20,
                ))),
        )(spec_c, par_c, met_c, sched_c, *extra_c, lo, hi, *frozen, *bufs)
        bufs_out, mrows = list(outs[:n_state]), outs[n_state]
        if plan_rs != spe_pad:   # sub-epoch metric rows -> per-epoch sums
            mrows = mrows.reshape(
                (E, spe_pad // plan_rs) + mrows.shape[1:]).sum(axis=1)
        mkeys = METRIC_KEYS + (
            ("constraint_loss",) if settings.constraint_w else ()
        )
        new_states, metrics_list = [], []
        for m in range(M):
            new_states.append(unpack_state(
                states[m],
                [b if M == 1 else b[m] for b in bufs_out[:16]],
                [b if M == 1 else b[m] for b in bufs_out[16:18]],
                T, S, d_steps=d_inc,
            ))
            metrics_list.append(
                {k: mrows[:, m, j] for j, k in enumerate(mkeys)}
            )
        return tuple(new_states), metrics_list

    stream_jit = jax.jit(_streams_all)
    kernel_jit = partial(jax.jit, static_argnums=(1, 2),
                         donate_argnums=(0,))(_kernel_body)

    validated = [False]  # first call only: later states come from this
    # kernel, which advances every member's counters identically

    def ensemble_epoch(states, ds, key: jax.Array, scales: jax.Array):
        states = tuple(states)
        if len(states) != M:
            raise ValueError(f"expected {M} states, got {len(states)}")
        if not validated[0]:
            # the shared sched/bias-correction streams are built from
            # member 0's counters — a member at a different training
            # position would silently train with the wrong LR position
            # and Adam bias corrections.  int() syncs tiny scalars; doing
            # it on the first call only keeps chunk dispatch async.
            for i, st in enumerate(states[1:], start=1):
                same = (
                    int(st.step) == int(states[0].step)
                    and int(st.g_opt[1][0].count)
                    == int(states[0].g_opt[1][0].count)
                    and int(st.d_opt[1][0].count)
                    == int(states[0].d_opt[1][0].count)
                )
                if not same:
                    raise ValueError(
                        f"member {i} step/opt counts differ from member 0 "
                        f"({int(st.step)} vs {int(states[0].step)}): "
                        "packed members share one schedule stream and "
                        "must sit at the same training position (fresh "
                        "or equally-resumed seed-ensemble members)"
                    )
            # the launch carries ONE frozen F (member 0's) — a member
            # with different surrogate weights would silently train
            # against the wrong physics.  Cheap fingerprint (one scalar
            # sync per member, first call only).
            def _f_fingerprint(variables):
                leaves = jax.tree_util.tree_leaves(variables)
                return float(
                    sum(jnp.sum(jnp.abs(l).astype(jnp.float32)) for l in leaves)
                )

            fp0 = _f_fingerprint(states[0].f.variables)
            for i, st in enumerate(states[1:], start=1):
                if _f_fingerprint(st.f.variables) != fp0:
                    raise ValueError(
                        f"member {i}'s frozen F differs from member 0's: "
                        "the packed launch carries one shared surrogate "
                        "(member 0's) — all members must be built from "
                        "the same forward_variables"
                    )
            validated[0] = True
        E = int(scales.shape[0])
        spe = max(1, ds.spectra.shape[0] // B)
        rngs = jnp.stack([st.rng for st in states])
        streams = stream_jit(
            rngs, states[0].step, states[0].g_opt[1][0].count,
            states[0].d_opt[1][0].count, ds, key, scales,
        )
        new_states, metrics = kernel_jit(states, E, spe, *streams)
        return list(new_states), metrics

    return ensemble_epoch


def make_pallas_subepoch_fn(
    cfg: PiGanConfig, settings, *, lr_g: float | None = None,
    lr_d: float | None = None, schedule_g: str | None = None,
    schedule_d: str | None = None, horizon_epochs: int | None = None,
    interpret: bool = False,
):
    """GAN driver for datasets past the one-program grid envelope
    (spe_pad > _MAX_PROGRAM_GRID, i.e. beyond ~240k samples at batch 64,
    where make_pallas_multi_epoch_fn cannot fit even ONE epoch in a
    jitted program).  Each epoch runs as spe_pad/L chained jitted calls
    of L grid steps (_gan_sub_plan), every call ONE single launch with
    the split XLA prologue — the hardware-proven-clean program shape
    (the forward sub-epoch driver's round-3 root-cause design).  Same
    contract as make_pallas_multi_epoch_fn; per-epoch metric rows are
    the sums of the calls' partial rows (the kernel divides by the TRUE
    steps_per_epoch).  Divisor-less spe pads each epoch to spe_pad and
    gates the tail call's padded steps into no-ops via the sched
    stream's `live` lane (lane 8): zero G/D/BN/EMA update, zero metric
    contribution, step/rng/counts advanced by REAL steps only.

    Extra envelope vs the one-program factory: the stochastic-stream
    knobs stay on XLA (supports_gan_subepoch — their per-step rng chain
    spans the whole epoch); everything else (constraint annealing,
    cycle, d_update_every, sigmoid squash, EMA, per-phase optimizer
    overrides, both detach modes) runs in-kernel."""
    reason = supports_megakernel(cfg, settings) or supports_gan_subepoch(settings)
    if reason is not None:
        raise ValueError(f"GAN sub-epoch megakernel unsupported here: {reason}")
    g_overridden = lr_g is not None or schedule_g is not None
    d_overridden = lr_d is not None or schedule_d is not None
    if (g_overridden or d_overridden) and horizon_epochs is None:
        raise ValueError("optimizer overrides need horizon_epochs")
    S = cfg.data.spectrum_dim
    B = cfg.train.batch_size
    W = _up(S + 4)
    clip = float(cfg.train.grad_clip)
    k_d = int(settings.d_update_every)
    use_ema = float(settings.ema_decay) > 0.0
    bf16 = cfg.train.compute_dtype == "bfloat16"

    def _mk_sched(kind: str, lr: float, total_epochs: int, spe: int):
        from ..train.schedules import make_schedule

        return make_schedule(kind, lr, total_epochs, spe)

    def _mk_sub_call(live_steps: int):
        def _streams(step, g_count, d_count, ds, key_e, scale, offset):
            """Gather/schedule stream construction for ONE sub-epoch call
            (the XLA prologue) — compiled as its OWN jitted program,
            exactly like the forward sub-epoch driver (fusing it with the
            aliased pallas_call corrupts kernel operands on v5e)."""
            N = ds.spectra.shape[0]
            spe = max(1, N // B)
            L, spe_pad = _gan_sub_plan(spe)
            if g_overridden:
                g_sched = _mk_sched(
                    schedule_g or "cosine",
                    cfg.train.lr_g if lr_g is None else lr_g,
                    horizon_epochs, spe,
                )
            else:
                g_sched = cosine_schedule(
                    cfg.train.lr_g, cfg.train.num_epochs, spe, 0.01
                )
            if d_overridden:
                d_sched = _mk_sched(
                    schedule_d or "step",
                    cfg.train.lr_d if lr_d is None else lr_d,
                    horizon_epochs, spe,
                )
            else:
                d_sched = step_schedule(
                    cfg.train.lr_d, cfg.train.num_epochs, spe, 0.5, 0.25
                )
            idx_full = epoch_indices(key_e, N, B)              # (spe, B)
            if spe_pad != spe:
                # gated tail rows index sample 0 — data content is
                # irrelevant (the live gate zeroes their effect) but must
                # be a valid, finite batch
                idx_full = jnp.pad(idx_full, ((0, spe_pad - spe), (0, 0)))
            idx = jax.lax.dynamic_slice(idx_full, (offset, 0), (L, B))
            par_g = jnp.pad(ds.params, ((0, 0), (0, LANE - 4)))[idx]
            met_g = jnp.pad(ds.metrics_norm, ((0, 0), (0, LANE - 8)))[idx]
            spec_g = jnp.pad(ds.spectra, ((0, 0), (0, W - S)))[idx]
            mask = (jnp.arange(L) < live_steps).astype(jnp.float32)
            if k_d > 1:
                d_mask = (
                    (step + jnp.arange(L)) % k_d == 0
                ).astype(jnp.float32) * mask
                upd_before = (jnp.cumsum(d_mask) - d_mask).astype(d_count.dtype)
            else:
                d_mask = mask
                upd_before = jnp.arange(L, dtype=d_count.dtype)
            tg = g_count + jnp.arange(L)
            td = d_count + upd_before
            tgf = (tg + 1).astype(jnp.float32)
            tdf = (td + 1).astype(jnp.float32)
            lanes = [
                g_sched(tg) * mask, d_sched(td) * mask,
                mask / (1.0 - jnp.power(_B1, tgf)),
                mask / (1.0 - jnp.power(_B2, tgf)),
                mask / (1.0 - jnp.power(_B1, tdf)),
                mask / (1.0 - jnp.power(_B2, tdf)),
                d_mask,
                scale.astype(jnp.float32) * mask,
                mask,                              # `live` gate (lane 8)
            ]
            sched = jnp.stack(
                lanes + [jnp.zeros((L,), jnp.float32)] * (LANE - len(lanes)),
                axis=1,
            ).reshape(L, 1, LANE)
            lo = jnp.pad(ds.param_lo, (0, LANE - 4)).reshape(1, LANE)
            hi = jnp.pad(ds.param_hi, (0, LANE - 4)).reshape(1, LANE)
            return spec_g, par_g, met_g, sched, lo, hi

        def _kernel_body(state, spe, *streams):
            L, spe_pad = _gan_sub_plan(spe)
            padded = spe_pad != spe
            spec_c, par_c, met_c, sched_c, lo, hi = streams
            if k_d > 1:
                # D's actual update count this call = the live steps whose
                # d_mask lane is 1 (padded tail rows stream d_mask 0)
                d_inc = jnp.sum(sched_c[:, 0, 6]).astype(
                    state.d_opt[1][0].count.dtype)
            else:
                d_inc = None
            train, stats, frozen = pack_state(state, S, frozen_bf16=bf16)
            if use_ema:
                if state.g_ema is None:
                    raise ValueError(
                        "StepSettings.ema_decay > 0 requires a state carrying "
                        "g_ema — init with init_pigan_state(..., ema=True) "
                        "(Trainer does this automatically)"
                    )
                stats = stats + pack_ema(state, S)
            bufs = train + stats
            const = lambda shape: pl.BlockSpec(  # noqa: E731
                shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
            )
            n_state = len(bufs)
            n_lead = 4 + 2 + len(frozen)          # streams + lo/hi + frozen
            aliases = {} if _NO_ALIAS else {
                n_lead + k: k for k in range(n_state)
            }
            pack = 1 if _DEBUG_PER_STEP else _resolve_pack(L, L)
            kernel = _make_kernel(
                S, B, spe, settings, clip,
                bf16=bf16, row_steps=L, padded=padded, pack=pack,
            )
            row = lambda *shape: pl.BlockSpec(  # noqa: E731
                (pack,) + shape, lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
            in_specs = (
                [row(B, W), row(B, LANE), row(B, LANE), row(1, LANE)]
                + [const((1, LANE)), const((1, LANE))]
                + [const(f.shape) for f in frozen]
                + [const(b.shape) for b in bufs]
            )
            n_rows = L if _DEBUG_PER_STEP else 1
            midx = (lambda i: (i, 0, 0)) if _DEBUG_PER_STEP else (
                lambda i: (0, 0, 0))
            out_specs = (
                [const(b.shape) for b in bufs]
                + [pl.BlockSpec((1, 1, LANE), midx, memory_space=pltpu.VMEM)]
            )
            out_shape = (
                [jax.ShapeDtypeStruct(b.shape, b.dtype) for b in bufs]
                + [jax.ShapeDtypeStruct((n_rows, 1, LANE), jnp.float32)]
            )
            outs = pl.pallas_call(
                kernel,
                grid=(L // pack,),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                input_output_aliases=aliases,
                interpret=interpret,
                **({} if interpret else dict(
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 2**20,
                    ))),
            )(spec_c, par_c, met_c, sched_c, lo, hi, *frozen, *bufs)
            bufs_out = outs[:n_state]
            mrows = outs[n_state]
            train_out = bufs_out[:16]
            stats_out = bufs_out[16:18]
            ema_out = bufs_out[18:] if use_ema else None
            new_state = unpack_state(
                state, train_out, stats_out, live_steps, S,
                d_steps=d_inc, ema_out=ema_out,
            )
            return new_state, jnp.sum(mrows, axis=0)[0]        # (LANE,)

        donate = () if _NO_DONATE else (0,)
        stream_jit = jax.jit(_streams)
        kernel_jit = partial(jax.jit, static_argnums=(1,),
                             donate_argnums=donate)(_kernel_body)

        def sub_call(state, ds, key_e, scale, offset):
            spe = max(1, ds.spectra.shape[0] // B)
            streams = stream_jit(
                state.step, state.g_opt[1][0].count,
                state.d_opt[1][0].count, ds, key_e, scale, offset,
            )
            return kernel_jit(state, spe, *streams)

        return sub_call

    calls: dict = {}

    def multi_epoch(state, ds, key: jax.Array, scales: jax.Array):
        E = int(scales.shape[0])
        N = int(ds.spectra.shape[0])
        spe = max(1, N // B)
        L, spe_pad = _gan_sub_plan(spe)
        n_sub = spe_pad // L
        tail_live = L - (spe_pad - spe)     # == L on ungated plans
        keys = jax.random.split(key, E)
        rows = []
        dispatched = 0
        for e in range(E):
            acc = None
            for j in range(n_sub):
                live = tail_live if j == n_sub - 1 else L
                if live not in calls:
                    calls[live] = _mk_sub_call(live)
                state, mrow = calls[live](
                    state, ds, keys[e], scales[e], jnp.int32(j * L)
                )
                acc = mrow if acc is None else acc + mrow
                dispatched += 1
                if _GAN_SUB_SYNC_EVERY and dispatched % _GAN_SUB_SYNC_EVERY == 0:
                    jax.device_get(state.step)
            rows.append(acc)
        mets = jnp.stack(rows)                                 # (E, LANE)
        mkeys = METRIC_KEYS + (
            ("constraint_loss",) if settings.constraint_w else ()
        )
        metrics = {k: mets[:, j] for j, k in enumerate(mkeys)}
        if _DEBUG_LANES:
            for off in range(16):
                metrics[f"dbg_{off}"] = mets[:, len(mkeys) + off]
        return state, metrics

    multi_epoch.sub_epoch = True  # Trainer: skip the per-call chunk clamp
    # exposed for hardware forensics (examples/gan_subepoch_probe.py):
    # drive individual sub-calls with host syncs between them
    multi_epoch._mk_sub_call = _mk_sub_call
    multi_epoch._calls = calls
    return multi_epoch


# ---------------------------------------------------------------------------
# Forward-pretrain megakernel (pretrain_fwd_model.py semantics)
# ---------------------------------------------------------------------------
#
# Same VMEM-residency idea for the surrogate pretraining phase: F's params +
# Adam moments (~20 MB fp32) stay on-chip across the whole multi-epoch
# chunk.  One semantic difference from the XLA path: F trains with dropout,
# and the kernel draws its masks from the TPU hardware PRNG
# (pltpu.prng_random_bits) instead of jax.random — the DISTRIBUTION matches
# (per-layer Bernoulli(1-rate), scaled 1/keep), the bitstream does not.
# tests/test_megakernel.py checks exact gradient parity with dropout_rate=0
# and distributional health with dropout on.


def supports_forward_megakernel(cfg: PiGanConfig) -> str | None:
    if cfg.forward_model.name != "mlp" or tuple(cfg.forward_model.hidden_dims) != (
        256, 512, 1024, 512, 256,
    ):
        return "forward model is not the baseline MLP"
    if cfg.train.compute_dtype not in ("float32", "bfloat16"):
        return f"compute_dtype {cfg.train.compute_dtype!r} unsupported"
    if cfg.train.adam_state_dtype != "float32":
        # same hardware invariant as the GAN kernel: the split
        # param/moment layout bf16 moments require miscompiles on v5e
        # (round-3d root cause, RESULTS.md) — narrow moments are an
        # XLA-path feature
        return "adam_state_dtype != float32 is XLA-path only"
    if cfg.data.param_dim != 4 or cfg.data.metrics_dim != 8:
        return "non-default param/metrics dims"
    if cfg.forward_model.leaky_slope != 0.2:
        return "non-default leaky_slope (kernel hardcodes 0.2)"
    if cfg.train.grad_clip <= 0:
        return "grad_clip <= 0 (kernel assumes the optax clip stage exists)"
    if cfg.train.batch_size % 8 != 0:
        return "batch_size not a multiple of 8 (TPU sublane tiling)"
    return None


def _fwd_tensor_specs(S: int):
    W = _up(S + 4)
    specs = []
    in_dim = 8   # input layer: 4 true param rows (vector-head storage)
    for i, out in enumerate(_F_DIMS):
        blk = f"MLPBlock_{i}"
        specs += [
            ((blk, "Dense_0", "kernel"), (in_dim, out)),
            ((blk, "Dense_0", "bias"), (1, out)),
            ((blk, "NormAct_0", "LayerNorm_0", "scale"), (1, out)),
            ((blk, "NormAct_0", "LayerNorm_0", "bias"), (1, out)),
        ]
        in_dim = out
    # split head (recombined on unpack); the metrics half is stored
    # TRANSPOSED (8 true rows x 256) like the GAN kernel's vector heads
    specs += [
        (("Dense_0", "kernel", "spec"), (256, W)),
        (("Dense_0", "bias", "spec"), (1, W)),
        (("Dense_0", "kernel", "met"), (8, 256)),
        (("Dense_0", "bias", "met"), (1, LANE)),
    ]
    return specs


def pack_forward_state(state, S: int):
    """ForwardState -> packed (3, r, c) fp32 buffers [param, mu, nu] —
    the hardware-validated layout, see pack_state."""
    adam = state.opt[1][0]
    fP, mu, nu = state.f.params, adam.mu, adam.nu
    bufs = []
    for path, (r, c) in _fwd_tensor_specs(S):
        if path[0] == "Dense_0":
            which = path[2]
            sl = (slice(None), slice(0, S)) if which == "spec" else (
                slice(None), slice(S, None))
            if path[1] == "bias":
                sl = sl[1]
            vals = (fP["Dense_0"][path[1]][sl], mu["Dense_0"][path[1]][sl],
                    nu["Dense_0"][path[1]][sl])
            if which == "met" and path[1] == "kernel":
                vals = tuple(v.T for v in vals)   # transposed storage
        else:
            vals = (_get(fP, path), _get(mu, path), _get(nu, path))
        bufs.append(jnp.stack([
            _pad2(vals[0].astype(jnp.float32), r, c),
            _pad2(vals[1].astype(jnp.float32), r, c),
            _pad2(vals[2].astype(jnp.float32), r, c),
        ]))
    return bufs


def unpack_forward_state(state, bufs, n_steps: int, S: int):
    adam, sched_st = state.opt[1]
    new = [state.f.params, adam.mu, adam.nu]
    head = [
        [jnp.zeros_like(t["Dense_0"]["kernel"]) for t in new],
        [jnp.zeros_like(t["Dense_0"]["bias"]) for t in new],
    ]
    specs = _fwd_tensor_specs(S)
    for i, (path, _) in enumerate(specs):
        for slot in range(3):
            plane = bufs[i][slot]
            if path[0] == "Dense_0":
                idx = 0 if path[1] == "kernel" else 1
                tgt = head[idx][slot]
                plane = plane.astype(tgt.dtype)
                if path[2] == "spec":
                    cropped = _crop(plane, (tgt.shape[0], S) if idx == 0 else (S,))
                    if idx == 0:
                        tgt = tgt.at[:, :S].set(cropped)
                    else:
                        tgt = tgt.at[:S].set(cropped)
                else:
                    width = tgt.shape[-1] - S
                    if idx == 0:   # transposed storage: crop (8, 256) -> T
                        cropped = _crop(plane, (width, tgt.shape[0])).T
                        tgt = tgt.at[:, S:].set(cropped)
                    else:
                        cropped = _crop(plane, (width,))
                        tgt = tgt.at[S:].set(cropped)
                head[idx][slot] = tgt
            else:
                leaf = _get(new[slot], path)
                new[slot] = _set(
                    new[slot], path,
                    _crop(plane, leaf.shape).astype(leaf.dtype),
                )
    for slot in range(3):
        new[slot] = _set(new[slot], ("Dense_0", "kernel"), head[0][slot])
        new[slot] = _set(new[slot], ("Dense_0", "bias"), head[1][slot])
    inc = jnp.asarray(n_steps, adam.count.dtype)
    opt = (state.opt[0], (
        adam._replace(count=adam.count + inc, mu=new[1], nu=new[2]),
        sched_st._replace(count=sched_st.count + inc),
    ))

    def _advance(r, _):
        return jax.random.split(r, 2)[0], None

    rng, _ = jax.lax.scan(_advance, state.rng, None, length=n_steps)
    return state.replace(
        step=state.step + n_steps, rng=rng,
        f=state.f.replace(params=new[0]), opt=opt,
    )


def _make_forward_kernel(
    S: int, B: int, steps_per_epoch: int, fsettings, clip: float,
    dropout_rate: float, bf16: bool = False, row_steps: int | None = None,
    padded: bool = False, pack: int = 1,
):
    rs = row_steps or steps_per_epoch
    if pack < 1 or rs % pack:
        raise ValueError(f"pack {pack} must divide row_steps {rs}")
    W = _up(S + 4)
    w_spec = float(fsettings.spectrum_w)
    w_met = float(fsettings.metrics_w)
    w_smooth = float(fsettings.smoothness_w)
    w_l1 = float(fsettings.l1_w)
    keep = 1.0 - float(dropout_rate)
    use_drop = dropout_rate > 0.0
    # numpy scalar so it embeds as a literal (a jnp scalar would be a
    # captured constant, which pallas kernels reject; a python int >2^31
    # overflows weak-typed promotion)
    import numpy as _np

    thresh = _np.uint32(min(2**32 - 1, int(round(keep * 2**32))))
    mm_in = jnp.bfloat16 if bf16 else jnp.float32
    # f_tx uses Adam defaults (b1=.9)
    adam_apply = _make_adam(0.9, _B2, clip)

    def mm(a, b):
        return jnp.dot(
            a.astype(mm_in), b.astype(mm_in), preferred_element_type=jnp.float32
        )

    def dotT0(a, b):
        return jax.lax.dot_general(
            a.astype(mm_in), b.astype(mm_in), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dotT1(a, b):
        return jax.lax.dot_general(
            a.astype(mm_in), b.astype(mm_in), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def csum(x):
        return jnp.sum(x, axis=0, keepdims=True)

    def kernel(*refs):
        (par_ref, spec_ref, met_ref, sched_ref, seed_ref) = refs[:5]
        out0 = 5 + 24               # aliased inputs are refs[5:29]
        train = list(refs[out0: out0 + 24])    # packed (3, r, c) buffers
        metrics_ref = refs[out0 + 24]

        i = pl.program_id(0)

        def _one_step(step_k):
            sched_row = sched_ref[step_k]
            lr = sched_row[0, 0]
            inv1 = sched_row[0, 1]
            inv2 = sched_row[0, 2]
            # gated tail-call padding (_fwd_sub_plan): 0.0 on padded steps —
            # the Adam update is skipped and the metric row zeroed, making a
            # padded step a complete no-op (mirrors the GAN kernel's `live`)
            live = sched_row[0, 3] if padded else None
            if use_drop:
                pltpu.prng_seed(seed_ref[step_k][0, 0])

            x0 = par_ref[step_k]                 # (B, LANE) params_norm, pads 0
            spectra = spec_ref[step_k]           # (B, W), pads 0
            met_pad = met_ref[step_k]            # (B, LANE), pads 0

            a = x0
            saved = []
            for li in range(5):
                wb, bb, gb, beb = train[4 * li: 4 * li + 4]
                if li == 0:
                    # input layer: 4 true param rows -> VPU outer-product sum
                    t = bb[0] + sum(
                        a[:, k:k + 1] * wb[0][k:k + 1, :] for k in range(4)
                    )
                else:
                    t = mm(a, wb[0]) + bb[0]
                mu = jnp.mean(t, axis=-1, keepdims=True)
                var = jnp.maximum(   # flax-exact clamp, see BN comment above
                    0.0, jnp.mean(t * t, axis=-1, keepdims=True) - mu * mu
                )
                ivar = jax.lax.rsqrt(var + _LN_EPS)
                tc = t - mu
                ln = tc * ivar * gb[0] + beb[0]
                act = jnp.where(ln >= 0.0, ln, _SLOPE * ln)
                if use_drop:
                    bits = pltpu.bitcast(
                        pltpu.prng_random_bits(act.shape), jnp.uint32
                    )
                    sc = jnp.where(bits < thresh, 1.0 / keep, 0.0)
                    a_out = act * sc
                else:
                    sc = None
                    a_out = act
                saved.append((a, tc, ivar, ln, sc))
                a = a_out
            w6s, b6s, w6m, b6m = train[20], train[21], train[22], train[23]
            pred_spec = mm(a, w6s[0]) + b6s[0]           # (B, W) pads 0
            # metrics head (transposed storage): 8 VPU lane-reductions
            mlane = jax.lax.broadcasted_iota(jnp.int32, (B, LANE), 1)
            pred_metf = jnp.broadcast_to(b6m[0], (B, LANE))   # pads 0
            for k in range(8):
                pmk = jnp.sum(a * w6m[0][k:k + 1, :], axis=1, keepdims=True)
                pred_metf = pred_metf + jnp.where(mlane == k, pmk, 0.0)

            ds_spec = pred_spec - spectra
            ds_met = pred_metf - met_pad                  # pads 0
            spec_l = jnp.sum(ds_spec * ds_spec) / (B * S)
            met_l = jnp.sum(ds_met * ds_met) / (B * 8)
            loss = w_spec * spec_l + w_met * met_l
            drecon = w_spec * 2.0 * ds_spec / (B * S)
            dmet = jnp.where(mlane < 8, w_met * 2.0 * ds_met / (B * 8), 0.0)
            if w_smooth:
                d1 = pred_spec[:, 1:] - pred_spec[:, :-1]
                d2 = d1[:, 1:] - d1[:, :-1]
                dlane = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
                d2m = jnp.where(dlane < S - 2, d2, 0.0)
                loss = loss + w_smooth * jnp.sum(d2m * d2m) / (B * (S - 2))
                d2p = jnp.concatenate([d2m, jnp.zeros((B, 2), jnp.float32)], axis=1)
                zc = jnp.zeros((B, 1), jnp.float32)
                sh1 = jnp.concatenate([zc, d2p[:, : W - 1]], axis=1)
                sh2 = jnp.concatenate([zc, zc, d2p[:, : W - 2]], axis=1)
                drecon = drecon + w_smooth * 2.0 / (B * (S - 2)) * (
                    d2p - 2.0 * sh1 + sh2
                )
            if w_l1:
                loss = loss + w_l1 * (
                    jnp.sum(jnp.abs(ds_spec)) / (B * S)
                    + jnp.sum(jnp.abs(ds_met)) / (B * 8)
                )
                drecon = drecon + w_l1 * jnp.sign(ds_spec) / (B * S)
                dmet = dmet + jnp.where(
                    mlane < 8, w_l1 * jnp.sign(ds_met) / (B * 8), 0.0
                )

            row8 = jax.lax.broadcasted_iota(jnp.int32, (8, 256), 0)
            dW6s = dotT0(a, drecon)
            db6s = csum(drecon)
            # transposed metrics head: dW rows and the dx outer on the VPU
            dW6m = sum(
                jnp.where(
                    row8 == k,
                    jnp.sum(a * dmet[:, k:k + 1], axis=0, keepdims=True),
                    0.0,
                ) for k in range(8)
            )                                              # (8, 256)
            db6m = csum(dmet)
            da = dotT1(drecon, w6s[0]) + sum(
                dmet[:, k:k + 1] * w6m[0][k:k + 1, :] for k in range(8)
            )
            grads = [None] * 20
            for li in range(4, -1, -1):
                wb = train[4 * li]
                a_in, tc, ivar, ln, sc = saved[li]
                if sc is not None:
                    da = da * sc
                dln = da * jnp.where(ln >= 0.0, 1.0, _SLOPE)
                grads[4 * li + 2] = csum(dln * (tc * ivar))   # dgamma
                grads[4 * li + 3] = csum(dln)                  # dbeta
                gb = train[4 * li + 2]
                dxh = dln * gb[0]
                c_dim = tc.shape[1]
                dvar = jnp.sum(dxh * tc, axis=-1, keepdims=True) * (
                    -0.5
                ) * ivar * ivar * ivar
                dt = dxh * ivar
                dt = dt - jnp.mean(dt, axis=-1, keepdims=True) + dvar * 2.0 * tc / c_dim
                if li == 0:
                    # transposed input layer (4 true rows): dW on the VPU;
                    # dx = dt W^T only feeds the debug checksum lane
                    grads[0] = sum(
                        jnp.where(
                            row8 == k,
                            jnp.sum(a_in[:, k:k + 1] * dt, axis=0, keepdims=True),
                            0.0,
                        ) for k in range(4)
                    )
                    grads[1] = csum(dt)
                    if _DEBUG_LANES:
                        da = sum(
                            jnp.where(
                                mlane == k,
                                jnp.sum(dt * wb[0][k:k + 1, :], axis=1,
                                        keepdims=True),
                                0.0,
                            ) for k in range(4)
                        )
                else:
                    grads[4 * li] = dotT0(a_in, dt)            # dW
                    grads[4 * li + 1] = csum(dt)               # db
                    da = dotT1(dt, wb[0])
            adam_apply(
                train, grads + [dW6s, db6s, dW6m, db6m],
                lr, inv1, inv2, gate=live,
            )

            vals = (loss, spec_l, met_l)
            if _DEBUG_LANES:
                # forensic checksums for the hardware NaN bisect (fwd_subepoch
                # probe): forward-pass stages, backward seeds, optimizer inputs
                # and a post-update weight — the first NaN lane localizes the
                # corruption point.  Order = FWD_DEBUG_KEYS.
                dbg = {
                    "x0": jnp.sum(jnp.abs(x0)),
                    "spectra": jnp.sum(jnp.abs(spectra)),
                    "ln1": jnp.sum(jnp.abs(saved[0][3])),
                    "ln5": jnp.sum(jnp.abs(saved[4][3])),
                    "pred_spec": jnp.sum(jnp.abs(pred_spec)),
                    "drecon": jnp.sum(jnp.abs(drecon)),
                    "dW6s": jnp.sum(jnp.abs(dW6s)),
                    "dW1": jnp.sum(jnp.abs(grads[0])),
                    "dx": jnp.sum(jnp.abs(da)),
                    "lr": lr, "inv1": inv1, "inv2": inv2,
                    "W1_post": jnp.sum(jnp.abs(train[0][0])),
                }
                vals = vals + tuple(dbg[k] for k in FWD_DEBUG_KEYS)
            mlane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
            mrow = jnp.zeros((1, LANE), jnp.float32)
            for k, v in enumerate(vals):
                mrow = jnp.where(mlane1 == k, v, mrow)
            if padded:
                mrow = mrow * live
            return mrow

        mrow = _one_step(0)
        for _k in range(1, pack):
            mrow = mrow + _one_step(_k)
        mrow = mrow / steps_per_epoch
        rs_g = rs // pack

        @pl.when(i % rs_g == 0)
        def _():
            metrics_ref[0] = mrow

        @pl.when(i % rs_g != 0)
        def _():
            metrics_ref[0] = metrics_ref[0] + mrow

    return kernel


def make_pallas_forward_epoch_fn(
    cfg: PiGanConfig, fsettings, *, lr: float | None = None,
    total_epochs: int | None = None, interpret: bool = False,
    schedule: str = "cosine",
):
    """multi_epoch(state, ds, key, scales) for the forward-pretrain phase —
    drop-in for make_multi_epoch_fn(make_forward_step(...), bs).

    `scales` is the per-epoch LR multiplier stream (the forward phase has
    no constraint annealing, so the channel carries the host-side
    ReduceLROnPlateau controller's scale instead): the prologue multiplies
    the precomputed per-step LR lane by the epoch's scale, which is the
    kernel-path twin of make_forward_step's `lr_scale` update scaling.
    Pass ones when unused (exactly the old ignored-scales behaviour).

    lr/total_epochs parameterize the cosine schedule exactly like
    Trainer.pretrain_forward's optimizer override; defaults mirror
    make_optimizers (fwd_pretrain_lr / fwd_pretrain_epochs, eta_min 0)."""
    reason = supports_forward_megakernel(cfg)
    if reason is not None:
        raise ValueError(f"forward megakernel unsupported here: {reason}")
    S = cfg.data.spectrum_dim
    B = cfg.train.batch_size
    W = _up(S + 4)
    clip = float(cfg.train.grad_clip)
    base_lr = cfg.train.fwd_pretrain_lr if lr is None else lr
    horizon = cfg.train.fwd_pretrain_epochs if total_epochs is None else total_epochs

    def _streams(t0, ds, key: jax.Array, E: int, scales):
        """Gather/sched/seed stream construction (the XLA prologue) —
        compiled as its OWN jitted program: fusing it with the aliased
        pallas_call corrupts the kernel's operands on v5e (the round-3
        root cause — _FUSED_PROLOGUE note)."""
        N = ds.spectra.shape[0]
        spe = max(1, N // B)
        T = E * spe
        from ..train.schedules import make_schedule

        sched_fn = make_schedule(
            schedule, base_lr, horizon, spe, schedule_alpha=0.0
        )

        keys = jax.random.split(key, E)
        idx = jax.vmap(lambda k: epoch_indices(k, N, B))(keys).reshape(T, B)
        par_g = jnp.pad(ds.params_norm, ((0, 0), (0, LANE - 4)))[idx]
        spec_g = jnp.pad(ds.spectra, ((0, 0), (0, W - S)))[idx]
        met_g = jnp.pad(ds.metrics_norm, ((0, 0), (0, LANE - 8)))[idx]

        t = t0 + jnp.arange(T)
        tf = (t + 1).astype(jnp.float32)
        lr_scale = jnp.repeat(scales.astype(jnp.float32), spe)
        sched = jnp.stack([
            sched_fn(t) * lr_scale,
            1.0 / (1.0 - jnp.power(0.9, tf)),
            1.0 / (1.0 - jnp.power(_B2, tf)),
        ] + [jnp.zeros((T,), jnp.float32)] * (LANE - 3), axis=1).reshape(T, 1, LANE)
        seeds = jax.random.randint(
            jax.random.fold_in(key, 0x5EED), (T, 1, LANE), 0, 2**31 - 1, jnp.int32
        )
        return par_g, spec_g, met_g, sched, seeds

    def _kernel_body(state, E: int, spe: int, par_g, spec_g, met_g, sched, seeds):
        T = E * spe
        train = pack_forward_state(state, S)
        const = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )
        aliases = {} if _NO_ALIAS else {5 + k: k for k in range(len(train))}
        # the kernel's metric-row granularity must match the launch plan
        # _chunked_launch will resolve for these ungated streams
        _pls, _, _prs, _ = _resolve_plan(E, spe, padded_streams=False)
        pack = 1 if _DEBUG_PER_STEP else _resolve_pack(_pls, _prs)
        row3 = lambda: pl.BlockSpec(  # noqa: E731
            (pack, 1, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        )
        kernel = _make_forward_kernel(
            S, B, spe, fsettings, clip,
            dropout_rate=cfg.forward_model.dropout_rate,
            bf16=cfg.train.compute_dtype == "bfloat16",
            row_steps=_prs, pack=pack,
        )

        def launch(bufs, streams, n_steps, rsl):
            par_c, spec_c, met_c, sched_c, seed_c = streams
            in_specs = (
                [
                    pl.BlockSpec((pack, B, LANE), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((pack, B, W), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((pack, B, LANE), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    row3(), row3(),
                ]
                + [const(b.shape) for b in bufs]
            )
            out_specs = (
                [const(b.shape) for b in bufs]
                + [pl.BlockSpec((1, 1, LANE),
                                lambda i: (i // (rsl // pack), 0, 0),
                                memory_space=pltpu.VMEM)]
            )
            out_shape = (
                [jax.ShapeDtypeStruct(b.shape, b.dtype) for b in bufs]
                + [jax.ShapeDtypeStruct((n_steps // rsl, 1, LANE), jnp.float32)]
            )
            outs = pl.pallas_call(
                kernel,
                grid=(n_steps // pack,),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                input_output_aliases=aliases,
                interpret=interpret,
                **({} if interpret else dict(
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 2**20,
                    ))),
            )(par_c, spec_c, met_c, sched_c, seed_c, *bufs)
            return tuple(outs[:-1]), outs[-1]

        bufs, mrows = _chunked_launch(
            launch, train, (par_g, spec_g, met_g, sched, seeds), E, spe,
            padded_streams=False,
        )
        new_state = unpack_forward_state(state, bufs, T, S)
        metrics = {k: mrows[:, 0, j] for j, k in enumerate(FWD_METRIC_KEYS)}
        if _DEBUG_LANES:
            for off in range(len(FWD_DEBUG_KEYS)):
                metrics[f"dbg_{off}"] = mrows[:, 0, len(FWD_METRIC_KEYS) + off]
        return new_state, metrics

    fused_prologue = _FUSED_PROLOGUE            # captured at factory time
    stream_jit = jax.jit(_streams, static_argnums=(3,))
    kernel_jit = partial(jax.jit, static_argnums=(1, 2),
                         donate_argnums=(0,))(_kernel_body)

    if fused_prologue:
        # Forensic shape: prologue + kernel in ONE jitted program — the
        # round-3 corrupting shape (trips the fallback net at spe >= ~65,
        # e.g. 4,160 samples; kept only to reproduce the failure).
        @partial(jax.jit, donate_argnums=(0,))
        def fused(state, ds, key: jax.Array, scales: jax.Array):
            E = scales.shape[0]
            spe = max(1, ds.spectra.shape[0] // B)
            streams = _streams(state.opt[1][0].count, ds, key, E, scales)
            return _kernel_body(state, E, spe, *streams)

    def multi_epoch(state, ds, key: jax.Array, scales: jax.Array):
        E = int(scales.shape[0])
        spe = max(1, ds.spectra.shape[0] // B)
        if not interpret and E * spe > _FWD_MAX_TOTAL:
            raise ValueError(
                f"E*steps_per_epoch={E * spe} exceeds the forward kernel's "
                f"per-program grid bound {_FWD_MAX_TOTAL} (see the "
                "_FWD_MAX_TOTAL note); chain smaller calls from Python — "
                "Trainer.pretrain_forward does this itself"
            )
        if fused_prologue:
            return fused(state, ds, key, scales)
        streams = stream_jit(state.opt[1][0].count, ds, key, E, scales)
        return kernel_jit(state, E, spe, *streams)

    return multi_epoch


def make_pallas_forward_subepoch_fn(
    cfg: PiGanConfig, fsettings, *, lr: float | None = None,
    total_epochs: int | None = None, interpret: bool = False,
    schedule: str = "cosine",
):
    """Forward-pretrain driver for steps_per_epoch > _FWD_MAX_TOTAL.

    The forward kernel's Mosaic bound is per-PROGRAM (decomposing a
    program into smaller launches does NOT help — see the _FWD_MAX_TOTAL
    note), so large datasets cannot run an epoch as one jitted program.
    This driver runs each epoch as spe_pad/L separate jitted calls of L
    steps each (_fwd_sub_plan), chained from Python — chained calls are
    the hardware-proven-clean pattern.  Divisor-less spe pads each epoch
    to spe_pad and gates the tail call's padded steps into no-ops via the
    sched stream's `live` lane (zero Adam update, zero metric
    contribution, rng/step/count advanced by REAL steps only).  Same
    contract as make_pallas_forward_epoch_fn; per-epoch metric rows are
    the sums of the calls' partial rows (the kernel divides by the TRUE
    steps_per_epoch).  Dispatch is async, so per-call overhead is one
    host enqueue, not a device round trip."""
    reason = supports_forward_megakernel(cfg)
    if reason is not None:
        raise ValueError(f"forward megakernel unsupported here: {reason}")
    S = cfg.data.spectrum_dim
    B = cfg.train.batch_size
    W = _up(S + 4)
    clip = float(cfg.train.grad_clip)
    base_lr = cfg.train.fwd_pretrain_lr if lr is None else lr
    horizon = cfg.train.fwd_pretrain_epochs if total_epochs is None else total_epochs

    def _mk_sub_call(live_steps: int, static_offset: int | None = None):
        def _streams(t0, ds, key_e, seed_key, offset, lr_scale):
            """Gather/sched/seed stream construction (the XLA prologue)."""
            N = ds.spectra.shape[0]
            spe = max(1, N // B)
            L, spe_pad = _fwd_sub_plan(spe)
            padded = spe_pad != spe
            from ..train.schedules import make_schedule

            sched_fn = make_schedule(
                schedule, base_lr, horizon, spe, schedule_alpha=0.0
            )
            idx_full = epoch_indices(key_e, N, B)                  # (spe, B)
            if padded:
                # gated tail rows index sample 0 — data content is irrelevant
                # (the kernel's live gate zeroes their effect) but must be a
                # valid, finite batch
                idx_full = jnp.pad(idx_full, ((0, spe_pad - spe), (0, 0)))
            if static_offset is None:
                idx = jax.lax.dynamic_slice(idx_full, (offset, 0), (L, B))
            else:
                # forensic variant (_FWD_STATIC_OFFSET): offset baked into
                # the program — one jitted program per (live, offset) pair,
                # no traced dynamic_slice feeding the gathers
                idx = jax.lax.slice(
                    idx_full, (static_offset, 0), (static_offset + L, B)
                )
            par_g = jnp.pad(ds.params_norm, ((0, 0), (0, LANE - 4)))[idx]
            spec_g = jnp.pad(ds.spectra, ((0, 0), (0, W - S)))[idx]
            met_g = jnp.pad(ds.metrics_norm, ((0, 0), (0, LANE - 8)))[idx]
            t = t0 + jnp.arange(L)
            tf = (t + 1).astype(jnp.float32)
            mask = (jnp.arange(L) < live_steps).astype(jnp.float32)
            sched = jnp.stack([
                mask * sched_fn(t) * lr_scale,
                mask / (1.0 - jnp.power(0.9, tf)),
                mask / (1.0 - jnp.power(_B2, tf)),
                mask,                                # `live` gate (lane 3)
            ] + [jnp.zeros((L,), jnp.float32)] * (LANE - 4), axis=1).reshape(L, 1, LANE)
            seeds = jax.random.randint(
                seed_key, (L, 1, LANE), 0, 2**31 - 1, jnp.int32
            )
            return par_g, spec_g, met_g, sched, seeds

        def _kernel_body(state, spe, par_g, spec_g, met_g, sched, seeds):
            padded = _fwd_sub_plan(spe)[1] != spe
            L = par_g.shape[0]
            train = pack_forward_state(state, S)
            const = lambda shape: pl.BlockSpec(  # noqa: E731
                shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
            )
            pack = 1 if _DEBUG_PER_STEP else _resolve_pack(L, L)
            row3 = lambda: pl.BlockSpec(  # noqa: E731
                (pack, 1, LANE), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            )
            aliases = {} if _NO_ALIAS else {5 + k: k for k in range(len(train))}
            kernel = _make_forward_kernel(
                S, B, spe, fsettings, clip,
                dropout_rate=cfg.forward_model.dropout_rate,
                bf16=cfg.train.compute_dtype == "bfloat16",
                row_steps=L, padded=padded, pack=pack,
            )
            in_specs = (
                [
                    pl.BlockSpec((pack, B, LANE), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((pack, B, W), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((pack, B, LANE), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    row3(), row3(),
                ]
                + [const(b.shape) for b in train]
            )
            out_specs = (
                [const(b.shape) for b in train]
                + [pl.BlockSpec((1, 1, LANE), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)]
            )
            out_shape = (
                [jax.ShapeDtypeStruct(b.shape, b.dtype) for b in train]
                + [jax.ShapeDtypeStruct((1, 1, LANE), jnp.float32)]
            )
            outs = pl.pallas_call(
                kernel,
                grid=(L // pack,),
                in_specs=in_specs,
                out_specs=out_specs,
                out_shape=out_shape,
                input_output_aliases=aliases,
                interpret=interpret,
                **({} if interpret else dict(
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 2**20,
                    ))),
            )(par_g, spec_g, met_g, sched, seeds, *train)
            new_state = unpack_forward_state(
                state, list(outs[:-1]), live_steps, S
            )
            return new_state, outs[-1][0, 0]                       # (LANE,)

        donate = () if _NO_DONATE else (0,)
        if _FUSED_PROLOGUE:
            # Forensic shape: prologue + kernel in ONE jitted program.
            # CORRUPTS the kernel's VMEM operands on v5e hardware (see the
            # _FUSED_PROLOGUE note) — kept only to reproduce the failure.
            @partial(jax.jit, donate_argnums=donate)
            def sub_call(state, ds, key_e, seed_key, offset, lr_scale=1.0):
                N = ds.spectra.shape[0]
                spe = max(1, N // B)
                t0 = state.opt[1][0].count
                streams = _streams(t0, ds, key_e, seed_key, offset, lr_scale)
                return _kernel_body(state, spe, *streams)

            return sub_call

        # Default: two separate jitted programs chained host-side (still
        # fully async — one extra enqueue, no round trip).  The pallas
        # program contains ONLY pack + kernel + unpack; the gathers /
        # dynamic_slice / schedule math compile separately, which is the
        # hardware-proven-clean shape (fused corrupts — _FUSED_PROLOGUE).
        stream_jit = jax.jit(_streams)
        kernel_jit = partial(jax.jit, static_argnums=(1,),
                             donate_argnums=donate)(_kernel_body)

        def sub_call(state, ds, key_e, seed_key, offset, lr_scale=1.0):
            spe = max(1, ds.spectra.shape[0] // B)
            streams = stream_jit(
                state.opt[1][0].count, ds, key_e, seed_key, offset, lr_scale
            )
            return kernel_jit(state, spe, *streams)

        return sub_call

    calls: dict = {}

    def multi_epoch(state, ds, key: jax.Array, scales: jax.Array):
        E = int(scales.shape[0])
        N = int(ds.spectra.shape[0])
        spe = max(1, N // B)
        L, spe_pad = _fwd_sub_plan(spe)
        n_sub = spe_pad // L
        tail_live = L - (spe_pad - spe)     # == L on ungated plans
        keys = jax.random.split(key, E)
        rows = []
        dispatched = 0
        for e in range(E):
            acc = None
            for j in range(n_sub):
                live = tail_live if j == n_sub - 1 else L
                ck = (live, j * L if _FWD_STATIC_OFFSET else None)
                if ck not in calls:
                    calls[ck] = _mk_sub_call(live, ck[1])
                skey = jax.random.fold_in(keys[e], 0x5EED + j)
                state, mrow = calls[ck](
                    state, ds, keys[e], skey, jnp.int32(j * L), scales[e]
                )
                acc = mrow if acc is None else acc + mrow
                dispatched += 1
                if _FWD_SYNC_EVERY and dispatched % _FWD_SYNC_EVERY == 0:
                    # bound the in-flight program depth: device_get forces a
                    # true round trip (block_until_ready through the tunnel
                    # can return early — bench.py MEASUREMENT note)
                    jax.device_get(state.step)
            rows.append(acc)
        mets = jnp.stack(rows)                                 # (E, LANE)
        metrics = {k: mets[:, j] for j, k in enumerate(FWD_METRIC_KEYS)}
        if _DEBUG_LANES:
            for off in range(len(FWD_DEBUG_KEYS)):
                metrics[f"dbg_{off}"] = mets[:, len(FWD_METRIC_KEYS) + off]
        return state, metrics

    multi_epoch.sub_epoch = True  # Trainer: skip the per-call chunk clamp
    # exposed for hardware forensics (examples/fwd_subepoch_probe.py):
    # drive individual sub-calls with host syncs between them
    multi_epoch._mk_sub_call = _mk_sub_call
    multi_epoch._calls = calls
    return multi_epoch
