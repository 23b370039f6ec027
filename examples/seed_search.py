"""Vmapped seed search: N independent GAN trainings as ONE device program.

The round-2 quality recipe.  Four PI-GAN trainings with different init
seeds run as a single vmapped program on one chip (the ensemble axis of
parallel/ensemble.py, sharing one fused-step implementation with the
single-model trainer via `make_pigan_step(runtime_weights=True)`), with the
cosine LR horizon matched to the full epoch budget — the decisive knob:

    horizon 500 (default config): members plateau at param R2 ~0.984
    horizon 24000:                members reach      param R2  0.9991

Measured on v5e-1 (RESULTS.md "Seed-search quality"): 24,000 epochs x 4
members in ~2.6 min of GAN wall time; reference-protocol (train CSV) best
0.9991 vs the reference's best recorded 0.9888.  With --holdout the same
search trains on an 800-cell split and reports honest held-out scores
(peaks ~0.974 near 8,000 epochs; beyond that train keeps climbing while
held-out flattens — memorization, visible because this harness evaluates
both splits every chunk).

    python examples/seed_search.py --epochs 24000
    python examples/seed_search.py --epochs 24000 --holdout
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

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from pigan_thz_tpu import default_config
from pigan_thz_tpu.data import split_dataset, synthetic_dataset
from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.parallel.ensemble import (
    EnsembleSettings,
    evaluate_ensemble,
    evaluate_ensemble_mean,
    init_ensemble_states,
    make_ensemble_multi_epoch_fn,
    make_ensemble_pigan_step,
    weight_vector,
)
from pigan_thz_tpu.train import Trainer, make_optimizers


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=24000)
    ap.add_argument("--fwd-epochs", type=int, default=500)
    ap.add_argument("--eval-every", type=int, default=2000)
    ap.add_argument("--holdout", action="store_true",
                    help="train on an 800-cell split; report held-out scores")
    ap.add_argument("--save-best", metavar="DIR", default=None,
                    help="persist the best snapshot: the winning member as "
                         "the standard final trio, or the full stacked state "
                         "('ensemble_best') when the ensemble mean wins")
    args = ap.parse_args()

    t0 = time.time()
    cfg = default_config()
    # LR horizon == budget: leaving the default 500-epoch cosine horizon
    # caps members at ~0.984 param R2; matching it is worth +0.015
    cfg = cfg.replace(train=dataclasses.replace(cfg.train, num_epochs=args.epochs))
    full = synthetic_dataset(cfg.data)
    if args.holdout:
        train_ds, val_ds = split_dataset(full, val_frac=0.2,
                                         key=jax.random.PRNGKey(9))
    else:
        train_ds, val_ds = full, None

    trainer = Trainer(cfg, ds=train_ds, epochs_per_call=50)
    trainer.pretrain_forward(epochs=args.fwd_epochs, log_every=10**9)

    g, d, f = build_trio(cfg)
    spe = train_ds.num_samples // cfg.train.batch_size
    g_tx, d_tx, _ = make_optimizers(cfg, spe)
    states = init_ensemble_states(
        g, d, f, g_tx, d_tx, args.members, jax.random.PRNGKey(7),
        forward_variables=trainer.forward_state.f.variables,
    )
    weights = jnp.stack([weight_vector()] * args.members)
    step = make_ensemble_pigan_step(
        g, d, f, g_tx, d_tx, EnsembleSettings(detach_forward=False),
        train_ds.param_lo, train_ds.param_hi,
    )
    multi_epoch = make_ensemble_multi_epoch_fn(step, cfg.train.batch_size)

    best = {"r2": -float("inf"), "epoch": 0, "member": -1}
    key = jax.random.PRNGKey(11)
    e = 0
    while e < args.epochs:
        chunk = min(args.eval_every, args.epochs - e)
        key, sub = jax.random.split(key)
        # one jit call per chunk (vs one RPC per epoch) — the remote-tunnel
        # reliability + dispatch-cost rationale of make_multi_epoch_fn
        states, _ = multi_epoch(states, train_ds, sub, weights, chunk)
        e += chunk
        tr = evaluate_ensemble(g, f, states, train_ds)
        row = {"epoch": e,
               "train_r2": [round(float(x), 4) for x in tr["param_r2"]]}
        score_ds = val_ds if args.holdout else train_ds
        ev = evaluate_ensemble(g, f, states, score_ds) if args.holdout else tr
        # ensemble-mean inference beats the best member on held-out data
        # (0.9806 vs 0.9752 measured — RESULTS.md); track it alongside
        mean_ev = evaluate_ensemble_mean(g, f, states, score_ds)
        row["ensemble_mean_r2"] = round(float(mean_ev["param_r2"]), 4)
        if args.holdout:
            row["heldout_r2"] = [round(float(x), 4) for x in ev["param_r2"]]
        r2s = [float(x) for x in ev["param_r2"]] + [float(mean_ev["param_r2"])]
        i = max(range(len(r2s)), key=lambda j: r2s[j])
        if r2s[i] > best["r2"]:
            best = {"r2": r2s[i], "epoch": e,
                    "member": i if i < args.members else "ensemble_mean"}
            if args.save_best:
                # snapshot only when it will be persisted — a full stacked
                # ensemble copy is nontrivial HBM at 4 members
                best["snapshot"] = jax.tree.map(jnp.copy, states)
        print(json.dumps({**row, "wall_s": round(time.time() - t0, 1)}),
              flush=True)

    out = {"best_param_r2": round(best["r2"], 5), "best_epoch": best["epoch"],
           "member": best["member"], "protocol":
           "heldout" if args.holdout else "trainset",
           "wall_s": round(time.time() - t0, 1)}
    if args.save_best and "snapshot" in best:
        from pigan_thz_tpu.train import checkpoint as ckpt

        snap = best["snapshot"]
        if isinstance(best["member"], int):
            member_state = jax.tree.map(lambda x: x[best["member"]], snap)
            ckpt.save_final_trio(args.save_best, member_state)
        else:  # ensemble mean won: the predictor is all members together
            ckpt.save_pytree(args.save_best, "ensemble_best", snap)
        # architectures + de/normalization bounds ride with the snapshot so
        # `export --artifact ensemble` (and evaluate) rebuild/denormalize
        # exactly as trained — cfg drift at export time would otherwise
        # bake wrong physical bounds into the artifact silently
        ckpt.save_model_config(args.save_best, cfg)
        out["saved_to"] = os.path.abspath(args.save_best)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
