"""Physics-loss λ-ablation sweep (BASELINE config #3), end to end.

Trains N PI-GAN members with different Maxwell/LC/range loss weights as ONE
vmapped program (parallel/ensemble.py), then ranks members with the vmapped
evaluator — the whole grid runs in roughly the wall time of a single model.

    python examples/ablation_sweep.py --members 8 --epochs 100
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pigan_thz_tpu import default_config
from pigan_thz_tpu.data import synthetic_dataset
from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.parallel.ensemble import (
    EnsembleSettings,
    evaluate_ensemble,
    init_ensemble_states,
    make_ensemble_multi_epoch_fn,
    make_ensemble_pigan_step,
    weight_vector,
)
from pigan_thz_tpu.train import (
    init_forward_state,
    make_epoch_fn,
    make_forward_step,
    make_optimizers,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--forward-epochs", type=int, default=200)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    cfg = default_config()
    ds = synthetic_dataset(cfg.data)
    g, d, f = build_trio(cfg)
    steps = ds.num_samples // cfg.train.batch_size
    g_tx, d_tx, f_tx = make_optimizers(cfg, steps)

    # shared pretrained surrogate for all members
    fs = init_forward_state(f, f_tx, jax.random.PRNGKey(0))
    fepoch = make_epoch_fn(make_forward_step(f, f_tx), cfg.train.batch_size)
    for e in range(args.forward_epochs):
        fs, _ = fepoch(fs, ds, jax.random.PRNGKey(100 + e))

    # λ grid over (maxwell, lc, range) — the Q/FoM/peak-shift weighting axes
    grid = [
        (0.0, 0.0, 0.0), (1.0, 1.0, 0.1), (5.0, 1.0, 0.1), (1.0, 5.0, 0.1),
        (10.0, 10.0, 0.1), (1.0, 1.0, 1.0), (0.1, 0.1, 0.01), (2.0, 2.0, 0.5),
    ][: args.members]
    weights = jnp.stack(
        [weight_vector(maxwell=m, lc=l, range_=r) for m, l, r in grid]
    )

    states = init_ensemble_states(
        g, d, f, g_tx, d_tx, len(grid), jax.random.PRNGKey(1),
        forward_variables=fs.f.variables,
    )
    step = make_ensemble_pigan_step(
        g, d, f, g_tx, d_tx, EnsembleSettings(detach_forward=False),
        ds.param_lo, ds.param_hi
    )
    multi_epoch = make_ensemble_multi_epoch_fn(step, cfg.train.batch_size)

    t0 = time.time()
    states, m = multi_epoch(states, ds, jax.random.PRNGKey(1000), weights,
                            args.epochs)
    jax.block_until_ready(m)
    wall = time.time() - t0

    ev = evaluate_ensemble(g, f, states, ds)
    rows = []
    for i, (mw, lw, rw) in enumerate(grid):
        rows.append({
            "maxwell": mw, "lc": lw, "range": rw,
            "param_r2": round(float(ev["param_r2"][i]), 4),
            "recon_mse": round(float(ev["recon_mse"][i]), 5),
            "violation_rate": round(float(ev["violation_rate"][i]), 4),
        })
    rows.sort(key=lambda r: -r["param_r2"])
    result = {
        "members": len(grid),
        "epochs": args.epochs,
        "wall_s": round(wall, 1),
        "ranking": rows,
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(result, fh, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
