"""Resumable full training pipeline (preemption-safe).

Demonstrates the framework's checkpoint/resume capability end-to-end
(SURVEY §5: "TPU preemption is routine"): every stage persists its state
after each epoch chunk, and the script resumes from the last completed
chunk on restart.  Run under any supervisor that restarts on failure, e.g.:

    for i in $(seq 12); do timeout 600 python examples/full_pipeline.py \
        --workdir /tmp/pipeline && break; done

Stages: forward pretrain (500 ep) -> PI-GAN (500 ep, physics gradients
through frozen F) -> constraint fine-tune (100 ep, sigmoid squash) ->
comprehensive evaluation -> final artifacts.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from pigan_thz_tpu import default_config
from pigan_thz_tpu.train import Trainer, checkpoint as ckpt
from pigan_thz_tpu.train.steps import StepSettings
from pigan_thz_tpu.train.programs import constraint_finetune_phase  # noqa: F401 (documented alternative)


def load_progress(path: str) -> dict:
    if os.path.exists(path):
        with open(path) as fh:
            return json.load(fh)
    return {"fwd_epochs": 0, "gan_epochs": 0, "ft_epochs": 0}


def save_progress(path: str, prog: dict) -> None:
    with open(path, "w") as fh:
        json.dump(prog, fh)


def resume_or_die(trainer: Trainer, mgr, which: str, stage: str, done: int) -> None:
    """progress.json says `stage` has completed `done` epochs; the matching
    checkpoint MUST exist — silently training on from a fresh random state
    (e.g. a GAN against an untrained surrogate) would be far worse than
    failing loudly."""
    step = trainer.resume_from(mgr, which)
    if step is None:
        raise RuntimeError(
            f"progress.json records {stage}={done} but the '{stage}' "
            f"checkpoint manager is empty — inconsistent workdir (perhaps "
            f"written by an incompatible revision); delete the workdir or "
            f"repair progress.json"
        )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/pigan_pipeline")
    ap.add_argument("--fwd-epochs", type=int, default=500)
    ap.add_argument("--gan-epochs", type=int, default=500)
    ap.add_argument("--ft-epochs", type=int, default=100)
    ap.add_argument("--chunk", type=int, default=50)
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    prog_path = os.path.join(args.workdir, "progress.json")
    prog = load_progress(prog_path)
    t0 = time.time()
    print(f"resume state: {prog}", flush=True)

    cfg = default_config()
    trainer = Trainer(cfg, epochs_per_call=args.chunk)

    # ---- stage 1: forward pretrain (chunk-resumable) -------------------
    # The full ForwardState (weights + Adam moments + PRNG + step) and the
    # train history ride in every checkpoint, so a kill/resume continues the
    # uninterrupted loss curve exactly (no re-warming optimizer moments).
    fwd_mgr = ckpt.CheckpointManager(os.path.join(args.workdir, "fwd"),
                                     max_to_keep=2, save_interval=1)
    if prog["fwd_epochs"] > 0:
        trainer.pretrain_forward(epochs=0)  # epochs=0 = init state only
        resume_or_die(trainer, fwd_mgr, "forward", "fwd_epochs", prog["fwd_epochs"])
    while prog["fwd_epochs"] < args.fwd_epochs:
        n = min(args.chunk, args.fwd_epochs - prog["fwd_epochs"])
        trainer.pretrain_forward(epochs=n, log_every=10**9, seed=prog["fwd_epochs"])
        prog["fwd_epochs"] += n
        fwd_mgr.save(prog["fwd_epochs"], trainer.forward_state,
                     history=trainer.train_history, config=cfg)
        save_progress(prog_path, prog)
        print(f"fwd {prog['fwd_epochs']}/{args.fwd_epochs} "
              f"({time.time()-t0:.0f}s)", flush=True)
    fwd_mgr.close()

    # ---- stage 2: PI-GAN (manager-checkpointed) ------------------------
    settings = StepSettings.from_config(cfg, detach_forward=False)
    mgr = ckpt.CheckpointManager(os.path.join(args.workdir, "gan"),
                                 max_to_keep=2, save_interval=1)
    trainer.init_pigan()
    if prog["gan_epochs"] > 0:
        resume_or_die(trainer, mgr, "pigan", "gan_epochs", prog["gan_epochs"])
    while prog["gan_epochs"] < args.gan_epochs:
        n = min(args.chunk, args.gan_epochs - prog["gan_epochs"])
        trainer.train_pigan(epochs=n, log_every=10**9, settings=settings,
                            seed=prog["gan_epochs"])
        prog["gan_epochs"] += n
        mgr.save(prog["gan_epochs"], trainer.pigan_state,
                 history=trainer.train_history, config=cfg)
        save_progress(prog_path, prog)
        print(f"gan {prog['gan_epochs']}/{args.gan_epochs} "
              f"({time.time()-t0:.0f}s)", flush=True)

    # ---- stage 3: constraint repair ------------------------------------
    # NOTE deliberately NOT the sigmoid-squash fine-tune
    # (constraint_finetune_phase): training through a sigmoid while
    # evaluating the raw generator is incoherent — the reference's own
    # best-R² checkpoint kept a 91.4 % violation rate
    # (constraint_optimizer.py:38).  This phase uses the
    # unified-constraint-trainer repair (annealed enhanced constraint on
    # the raw output) which attacks the [0,1] window coherently.
    from pigan_thz_tpu.train.programs import constraint_phase, _anneal

    ft_settings = constraint_phase(args.ft_epochs).gan_settings
    anneal = _anneal(0.5, 2.0, args.ft_epochs)
    ft_mgr = ckpt.CheckpointManager(os.path.join(args.workdir, "ft"),
                                    max_to_keep=2, save_interval=1)
    if prog["ft_epochs"] > 0:
        resume_or_die(trainer, ft_mgr, "pigan", "ft_epochs", prog["ft_epochs"])
    while prog["ft_epochs"] < args.ft_epochs:
        n = min(args.chunk, args.ft_epochs - prog["ft_epochs"])
        base = prog["ft_epochs"]
        trainer.train_pigan(
            epochs=n, log_every=10**9, settings=ft_settings,
            constraint_schedule=lambda e, base=base: anneal(base + e),
            snapshot_metric="violation_rate", snapshot_mode="min",
            seed=10_000 + prog["ft_epochs"],
        )
        prog["ft_epochs"] += n
        ft_mgr.save(prog["ft_epochs"], trainer.pigan_state,
                    history=trainer.train_history, config=cfg)
        save_progress(prog_path, prog)
        print(f"ft {prog['ft_epochs']}/{args.ft_epochs} "
              f"({time.time()-t0:.0f}s)", flush=True)
    ft_mgr.close()

    # ---- repair acceptance gate ----------------------------------------
    # The constraint repair reproduces the reference's violation-first
    # snapshot policy, whose own artifact history documents the trade
    # (best-R2 checkpoint: 91.4% violation; best-violation: R2 wrecked —
    # constraint_optimizer.py:35-38).  In parity mode the [0,1] window is
    # statistically unsatisfiable for a healthy tanh generator (RESULTS.md),
    # so the repair can only buy violation points by destroying the inverse
    # map.  Gate it like a sane production pipeline: accept the repaired
    # model only if parameter R2 survives (within 0.02), else ship the
    # pre-repair model and report both.
    ev_ft = trainer.evaluate()
    ft_r2 = ev_ft["pigan_evaluation"]["parameter_prediction"]["r2"]
    ft_viol = ev_ft["structural_prediction_evaluation"][
        "param_range_violation_rate"]
    import jax.numpy as jnp  # noqa: E402

    ft_state = jax.tree_util.tree_map(jnp.copy, trainer.pigan_state)
    trainer.resume_from(mgr, "pigan")          # pre-repair (gan stage final)
    ev_pre = trainer.evaluate()
    pre_r2 = ev_pre["pigan_evaluation"]["parameter_prediction"]["r2"]
    repair_accepted = ft_r2 >= pre_r2 - 0.02
    if repair_accepted:
        trainer.pigan_state = ft_state
        ev = ev_ft
    else:
        ev = ev_pre
        print(
            f"constraint repair REJECTED: param R2 {pre_r2:.4f} -> "
            f"{ft_r2:.4f} (violation {ft_viol:.3f}); shipping the "
            "pre-repair model (see RESULTS.md on the unsatisfiable "
            "violation window)", flush=True,
        )
    mgr.close()

    # ---- stage 4: evaluate + finals ------------------------------------
    summary = {
        "param_r2": ev["pigan_evaluation"]["parameter_prediction"]["r2"],
        "violation": ev["structural_prediction_evaluation"][
            "param_range_violation_rate"],
        "cycle": ev["model_validation"]["cycle_consistency_error_mean"],
        "plausibility": ev["model_validation"]["physical_plausibility_mean"],
        "consistency": ev["structural_prediction_evaluation"][
            "consistency_score_mean"],
        "d_acc": ev["pigan_evaluation"]["discriminator_performance"][
            "overall_accuracy"],
        "stability": ev["model_validation"]["prediction_stability_mean"],
        "metrics_r2": ev["forward_network_evaluation"]["metrics_prediction"]["r2"],
        "spectrum_r2": ev["forward_network_evaluation"]["spectrum_prediction"]["r2"],
        "repair_accepted": repair_accepted,
        "repair_param_r2": ft_r2,
        "repair_violation": ft_viol,
        "wall_s": time.time() - t0,
    }
    print(json.dumps(summary, indent=2), flush=True)
    with open(os.path.join(args.workdir, "final_eval.json"), "w") as fh:
        json.dump(ev, fh, indent=2)
    trainer.save_final(os.path.join(args.workdir, "saved_models"))
    with open(os.path.join(args.workdir, "DONE"), "w") as fh:
        fh.write("ok\n")
    print("pipeline complete", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
