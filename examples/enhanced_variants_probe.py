"""Hardware probe: enhanced model variants — XLA steps/s + quality.

VERDICT r3 #4: every hardware number so far is the baseline MLP trio (the
megakernel path); the 7 enhanced variants train and are tested but have
no performance story.  This probe measures, on the real chip:

- XLA train steps/s for each enhanced variant swapped into the trio
  (the megakernel envelope only covers the baseline trio, so XLA IS the
  production path for these);
- optional 500-epoch quality (fwd pretrain + GAN param R²) per trio.

    python examples/enhanced_variants_probe.py --speed
    python examples/enhanced_variants_probe.py --quality --epochs 500
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if "--cpu" in sys.argv:  # off-device modes (JAX_PLATFORMS env is ignored)
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from pigan_thz_tpu import default_config
from pigan_thz_tpu.data import synthetic_dataset

# (label, generator name, discriminator name, forward name)
TRIOS = [
    ("baseline_mlp", "mlp", "mlp", "mlp"),
    ("conv_attn_G", "conv_attn", "mlp", "mlp"),
    ("residual_G", "residual", "mlp", "mlp"),
    ("dual_encoder_D", "mlp", "dual_encoder", "mlp"),
    ("conv_D", "mlp", "conv", "mlp"),
    ("multi_scale_D", "mlp", "multi_scale", "mlp"),
    ("branched_F", "mlp", "mlp", "branched"),
    ("physics_F", "mlp", "mlp", "physics"),
    ("uncertainty_F", "mlp", "mlp", "uncertainty"),
]


def _cfg_for(g: str, d: str, f: str, epochs: int):
    cfg = default_config()
    return cfg.replace(
        generator=dataclasses.replace(cfg.generator, name=g),
        discriminator=dataclasses.replace(cfg.discriminator, name=d),
        forward_model=dataclasses.replace(cfg.forward_model, name=f),
        train=dataclasses.replace(cfg.train, num_epochs=epochs),
    )


def run_speed(ds, labels, chunk, chain, n_meas, epochs):
    from pigan_thz_tpu.models import build_trio
    from pigan_thz_tpu.train import (
        StepSettings,
        init_pigan_state,
        make_multi_epoch_fn,
        make_optimizers,
        make_pigan_step,
    )

    spe = ds.num_samples // 64
    rows = []
    for label, g_n, d_n, f_n in labels:
        cfg = _cfg_for(g_n, d_n, f_n, epochs)
        g, d, f = build_trio(cfg)
        g_tx, d_tx, _ = make_optimizers(cfg, spe)
        state = init_pigan_state(
            g, d, f, g_tx, d_tx, jax.random.PRNGKey(0),
            spectrum_dim=cfg.data.spectrum_dim,
            param_dim=cfg.data.param_dim,
        )
        step = make_pigan_step(
            g, d, f, g_tx, d_tx, StepSettings.from_config(cfg),
            ds.param_lo, ds.param_hi,
        )
        fn = make_multi_epoch_fn(step, cfg.train.batch_size,
                                 with_scale=True, unroll=3)
        ones = jnp.ones((chunk,), jnp.float32)
        t0 = time.time()
        try:
            for w in range(2):
                state, m = fn(state, ds, jax.random.PRNGKey(10 + w), ones)
            jax.device_get(m["d_loss"])
        except Exception as exc:  # noqa: BLE001 — record and continue
            rows.append({"trio": label, "error": str(exc)[:200]})
            print(json.dumps(rows[-1]), flush=True)
            continue
        compile_s = time.time() - t0
        rates = []
        for e in range(n_meas):
            t0 = time.perf_counter()
            for c in range(chain):
                state, m = fn(
                    state, ds, jax.random.PRNGKey(100 + e * chain + c), ones)
            jax.device_get(m["d_loss"])
            rates.append(chain * chunk * spe /
                         (time.perf_counter() - t0))
        rates.sort()
        rows.append({
            "trio": label,
            "xla_steps_per_s": round(rates[-1], 1),
            "median": round(rates[len(rates) // 2], 1),
            "us_per_step": round(1e6 / rates[-1], 2),
            "warmup_s": round(compile_s, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def run_flops(ds, labels):
    """Per-trio FLOPs of ONE fused D->G step from XLA's cost analysis
    (ops/costs.py:compiled_fn_analysis) — the generic numerator for
    quoting the hardware steps/s as TFLOP/s and MFU.  Runs fine on CPU
    (--cpu): matmul FLOP counts are backend-independent."""
    from pigan_thz_tpu.data.dataset import gather_batch
    from pigan_thz_tpu.models import build_trio
    from pigan_thz_tpu.ops.costs import compiled_fn_analysis
    from pigan_thz_tpu.train import (
        StepSettings,
        init_pigan_state,
        make_optimizers,
        make_pigan_step,
    )

    spe = ds.num_samples // 64
    batch = gather_batch(ds, jnp.arange(64))
    rows = []
    for label, g_n, d_n, f_n in labels:
        cfg = _cfg_for(g_n, d_n, f_n, 100)
        g, d, f = build_trio(cfg)
        g_tx, d_tx, _ = make_optimizers(cfg, spe)
        state = init_pigan_state(
            g, d, f, g_tx, d_tx, jax.random.PRNGKey(0),
            spectrum_dim=cfg.data.spectrum_dim,
            param_dim=cfg.data.param_dim,
        )
        step = make_pigan_step(
            g, d, f, g_tx, d_tx, StepSettings.from_config(cfg),
            ds.param_lo, ds.param_hi,
        )
        ca = compiled_fn_analysis(step, state, batch, jnp.float32(1.0))
        n_params = sum(
            int(np.prod(x.shape))
            for x in jax.tree.leaves((state.g.params, state.d.params,
                                      state.f.params))
        )
        rows.append({
            "trio": label,
            "step_mflops": round(ca["flops"] / 1e6, 1),
            "step_mbytes": round(ca["bytes_accessed"] / 1e6, 1),
            "params": n_params,
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def run_quality(ds, labels, epochs):
    from pigan_thz_tpu.ops.metrics import r2_score
    from pigan_thz_tpu.train import Trainer
    from pigan_thz_tpu.train.steps import StepSettings

    rows = []
    for label, g_n, d_n, f_n in labels:
        cfg = _cfg_for(g_n, d_n, f_n, epochs)
        t0 = time.time()
        try:
            tr = Trainer(cfg, ds=ds, epochs_per_call=50, megakernel="off")
            tr.pretrain_forward(epochs=epochs, log_every=10**9)
            tr.init_pigan()
            tr.train_pigan(
                epochs=epochs, log_every=10**9,
                settings=StepSettings.from_config(cfg, detach_forward=False),
            )
            res = tr.evaluate()
            r2 = float(res["pigan_evaluation"]["parameter_prediction"]["r2"])
            fr2 = float(
                res["forward_network_evaluation"]["spectrum_prediction"]["r2"])
            rows.append({
                "trio": label, "epochs": epochs,
                "param_r2": round(r2, 4), "fwd_spec_r2": round(fr2, 4),
                "wall_s": round(time.time() - t0, 1),
            })
        except Exception as exc:  # noqa: BLE001
            rows.append({"trio": label, "error": str(exc)[:200]})
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--speed", action="store_true")
    ap.add_argument("--quality", action="store_true")
    ap.add_argument("--flops", action="store_true",
                    help="XLA cost-analysis FLOPs per step (CPU-safe)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on host CPU (handled at import)")
    ap.add_argument("--trios", type=str, default="")
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--n-meas", type=int, default=3)
    args = ap.parse_args()

    cfg = default_config()
    ds = synthetic_dataset(cfg.data)
    labels = TRIOS
    if args.trios:
        wanted = set(args.trios.split(","))
        labels = [t for t in TRIOS if t[0] in wanted]
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}), flush=True)
    out = {}
    if args.flops:
        out["flops"] = run_flops(ds, labels)
    if args.speed:
        out["speed"] = run_speed(ds, labels, args.chunk, args.chain,
                                 args.n_meas, args.epochs)
    if args.quality:
        out["quality"] = run_quality(ds, labels, args.epochs)
    print("RESULT " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
