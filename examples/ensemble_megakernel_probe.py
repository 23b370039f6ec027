"""Hardware probe: seed-ensemble training through the Pallas megakernel.

N independent GAN members train through the flagship whole-epoch kernel,
round-robined over jax.local_devices() by parallel/ensemble_megakernel.py
(one chip here -> sequential dispatch of the same compiled program; on a
pod slice the same driver keeps every chip busy with zero inter-chip
traffic).  Reports per-member and ensemble-mean quality plus aggregate
member-steps/s, comparable to the vmapped XLA ensemble of
examples/seed_search.py (RESULTS.md "Seed-search quality").

    python examples/ensemble_megakernel_probe.py --members 4 --epochs 2000
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from pigan_thz_tpu import default_config
from pigan_thz_tpu.data import synthetic_dataset
from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.parallel.ensemble import (
    evaluate_ensemble,
    evaluate_ensemble_mean,
)
from pigan_thz_tpu.parallel.ensemble_megakernel import train_seed_ensemble
from pigan_thz_tpu.train import Trainer
from pigan_thz_tpu.train.steps import StepSettings


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=2000)
    ap.add_argument("--fwd-epochs", type=int, default=500)
    ap.add_argument("--epochs-per-call", type=int, default=100)
    args = ap.parse_args()

    cfg = default_config()
    # LR horizon == budget (the seed_search lesson: the default 500-epoch
    # cosine horizon caps members well below their reachable R2)
    cfg = cfg.replace(train=dataclasses.replace(cfg.train,
                                                num_epochs=args.epochs))
    ds = synthetic_dataset(cfg.data)
    trainer = Trainer(cfg, ds=ds, epochs_per_call=50)
    trainer.pretrain_forward(epochs=args.fwd_epochs, log_every=10**9)

    settings = StepSettings.from_config(cfg, detach_forward=False)
    t0 = time.time()
    states, metrics = train_seed_ensemble(
        cfg, ds, args.members, settings=settings, epochs=args.epochs,
        key=jax.random.PRNGKey(7), epochs_per_call=args.epochs_per_call,
        forward_variables=trainer.forward_state.f.variables,
    )
    wall = time.time() - t0
    spe = ds.num_samples // cfg.train.batch_size
    total_steps = args.members * args.epochs * spe

    g, _, f = build_trio(cfg)
    ev = evaluate_ensemble(g, f, states, ds)
    mean_ev = evaluate_ensemble_mean(g, f, states, ds)
    out = {
        "members": args.members,
        "epochs": args.epochs,
        "devices": len(jax.local_devices()),
        "wall_s": round(wall, 1),
        "member_steps_per_s": round(total_steps / wall, 1),
        "final_g_loss": [round(float(x), 4) for x in metrics["g_loss"][:, -1]],
        "member_r2": [round(float(x), 4) for x in ev["param_r2"]],
        "ensemble_mean_r2": round(float(mean_ev["param_r2"]), 4),
        "ok": bool(all(float(x) > 0.5 for x in ev["param_r2"])),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
