"""Held-out evaluation protocol (reproduces the RESULTS.md table).

Train on an 800-sample split, evaluate all four suites on the 200 unseen
cells — the honest protocol the reference lacks (it evaluates on its
training CSV).  Also prints the statistical ceilings implied by the noise
level: with draw-to-draw R² c, the best possible model score against a
noisy target is (1+c)/2.

    python examples/holdout_eval.py --gan-epochs 1000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from pigan_thz_tpu import default_config
from pigan_thz_tpu.data import split_dataset, synthetic_dataset
from pigan_thz_tpu.evaluate import noise_ceilings as _lib_noise_ceilings
from pigan_thz_tpu.train import Trainer
from pigan_thz_tpu.train.steps import StepSettings


def noise_ceilings(cfg) -> dict:
    # library implementation (evaluate/ceilings.py); this example reports it
    return {k: round(v, 4) for k, v in _lib_noise_ceilings(cfg.data).items()}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gan-epochs", type=int, default=1000)
    ap.add_argument("--fwd-epochs", type=int, default=500)
    ap.add_argument("--val-frac", type=float, default=0.2)
    ap.add_argument("--ema-decay", type=float, default=0.0,
                    help="also train/evaluate a generator EMA track")
    ap.add_argument("--chunk", type=int, default=50,
                    help="epochs per jit call (smaller = faster compile)")
    args = ap.parse_args()

    t0 = time.time()
    import dataclasses as _dc

    cfg = default_config()
    # LR-schedule horizons tied to the actual budgets (RESULTS.md
    # "Seed-search": a mismatched cosine horizon silently caps quality)
    cfg = cfg.replace(train=_dc.replace(
        cfg.train, num_epochs=args.gan_epochs,
        fwd_pretrain_epochs=args.fwd_epochs,
    ))
    full = synthetic_dataset(cfg.data)
    train_ds, val_ds = split_dataset(full, val_frac=args.val_frac,
                                     key=jax.random.PRNGKey(9))
    trainer = Trainer(cfg, ds=train_ds, epochs_per_call=args.chunk)
    trainer.pretrain_forward(epochs=args.fwd_epochs, log_every=10**9)
    trainer.init_pigan()
    trainer.train_pigan(
        epochs=args.gan_epochs, log_every=10**9,
        settings=StepSettings.from_config(cfg, detach_forward=False,
                                          ema_decay=args.ema_decay),
    )

    def row(ev):
        return {
            "param_r2": round(ev["pigan_evaluation"]["parameter_prediction"]["r2"], 4),
            "spectrum_r2": round(
                ev["forward_network_evaluation"]["spectrum_prediction"]["r2"], 4),
            "metrics_r2": round(
                ev["forward_network_evaluation"]["metrics_prediction"]["r2"], 4),
            "cycle": round(ev["model_validation"]["cycle_consistency_error_mean"], 6),
        }

    out = {
        "ceilings": noise_ceilings(cfg),
        "train": row(trainer.evaluate()),
        "heldout": row(trainer.evaluator().run_comprehensive_evaluation(val_ds)),
    }
    if args.ema_decay > 0.0:
        out["heldout_ema"] = row(
            trainer.evaluator(use_ema=True).run_comprehensive_evaluation(val_ds)
        )
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
