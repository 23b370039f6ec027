"""Hardware probe: the canonical training PROGRAMS on the megakernel path.

The reference's richest behavior is its metric-gated multi-phase pipelines
(unified_constraint_trainer.py:949-996 progressive, emergency_trainer.py
repair, constraint_optimizer.py post-hoc finetune).  Round 3 extended the
megakernel envelope to every knob those phases use (constraint annealing,
cycle loss, d_update_every, adv-off warmup, sigmoid squash, per-phase LR
overrides).  This probe proves the claim END TO END on hardware:

  1. engagement: the full progressive pipeline + constraint finetune run
     under ``megakernel='force'`` — the Trainer RAISES if any chunk would
     silently leave the kernel, so completion itself is the proof;
  2. reliability: zero fallback trips across every phase;
  3. per-phase wall time and coarse steps/s (chunked sync included);
  4. final quality (param R2, violation rate, cycle consistency).

    python examples/program_probe.py                 # supervised, retries
    python examples/program_probe.py --compare-xla   # + same phases on XLA

Prints one JSON line: {"ok": bool, "phases": [...], ...}.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def _eval_summary(ev) -> dict:
    return {
        "param_r2": round(float(
            ev["pigan_evaluation"]["parameter_prediction"]["r2"]), 4),
        "violation_rate": round(float(
            ev["structural_prediction_evaluation"]["param_range_violation_rate"]), 4),
        "cycle_err": round(float(
            ev["model_validation"]["cycle_consistency_error_mean"]), 4),
    }


def _run_phases(trainer, phases, force_gates: bool, log) -> list[dict]:
    """run_program's loop, instrumented per phase (timing + trip deltas +
    newly compiled kernel programs + post-phase evaluation — the per-phase
    quality trajectory is the forensic for backend quality divergence)."""
    import dataclasses as dc

    rows = []
    latest_eval = None
    for phase in phases:
        if force_gates and phase.gate is not None:
            phase = dc.replace(phase, gate=None)
        if phase.gate is not None:
            if trainer.pigan_state is not None and latest_eval is None:
                latest_eval = trainer.evaluate()
            if latest_eval is None or not phase.gate(latest_eval):
                rows.append({"phase": phase.name, "skipped": True})
                continue
        keys_before = set(trainer._epoch_fns)
        trips_before = trainer.fallback_trips
        spe = trainer.steps_per_epoch
        t0 = time.perf_counter()
        if phase.kind == "forward":
            trainer.pretrain_forward(
                epochs=phase.epochs, settings=phase.forward_settings,
                lr=phase.lr, log_every=10**9,
                early_stop_patience=phase.early_stop_patience,
                keep_best=phase.keep_best,
            )
            if phase.refresh_frozen_forward and trainer.pigan_state is not None:
                trainer.init_pigan()
        else:
            if trainer.pigan_state is None:
                trainer.init_pigan()
            trainer.train_pigan(
                epochs=phase.epochs, settings=phase.gan_settings,
                log_every=10**9,
                constraint_schedule=phase.constraint_schedule,
                snapshot_metric=phase.snapshot_metric,
                snapshot_mode=phase.snapshot_mode,
                early_stop=phase.early_stop,
                lr_g=phase.lr_g, lr_d=phase.lr_d,
                schedule_g=phase.schedule_g, schedule_d=phase.schedule_d,
            )
        wall = time.perf_counter() - t0
        new_kernels = sorted(
            str(k[0]) for k in set(trainer._epoch_fns) - keys_before
        )
        post = (_eval_summary(trainer.evaluate())
                if trainer.pigan_state is not None else None)
        rows.append({
            "phase": phase.name,
            "kind": phase.kind,
            "epochs": phase.epochs,
            "wall_s": round(wall, 2),
            # wall INCLUDES first-call compilation (4-10 min/program through
            # the tunnel) — throughput claims come from bench.py, not here
            "steps_per_s_incl_compile": round(phase.epochs * spe / wall, 1),
            "trips": trainer.fallback_trips - trips_before,
            "new_kernels": new_kernels,
            "post_eval": post,
        })
        log(f"{phase.name}: {wall:.1f}s, trips={rows[-1]['trips']}, "
            f"new kernels={new_kernels}, post_eval={post}")
        latest_eval = None
    return rows


def run_inner(args) -> int:
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import dataclasses as dc

    from pigan_thz_tpu import default_config
    from pigan_thz_tpu.train import Trainer
    from pigan_thz_tpu.train.programs import (
        constraint_finetune_phase,
        progressive_pipeline,
    )

    cfg = default_config()
    cfg = cfg.replace(
        data=dc.replace(cfg.data, num_samples=args.num_samples),
        train=dc.replace(cfg.train, seed=args.seed),
    )
    E = args.epoch_scale

    def build_phases():
        return progressive_pipeline(
            forward_epochs=100 * E, gan_epochs=200 * E,
            constraint_epochs=100 * E, emergency_epochs=100 * E,
        ) + [constraint_finetune_phase(epochs=100 * E)]

    log = (lambda m: print(m, file=sys.stderr, flush=True))
    out: dict = {"backend": jax.default_backend(),
                 "megakernel": args.megakernel,
                 "num_samples": args.num_samples,
                 "epoch_scale": E,
                 "seed": args.seed,
                 "force_gates": bool(args.force_gates)}

    trainer = Trainer(cfg, megakernel=args.megakernel)
    out["spe"] = trainer.steps_per_epoch
    t0 = time.perf_counter()
    out["phases"] = _run_phases(trainer, build_phases(), args.force_gates, log)
    out["total_wall_s"] = round(time.perf_counter() - t0, 1)
    out["fallback_trips"] = trainer.fallback_trips
    out["fallback_events"] = trainer.fallback_events

    ev = trainer.evaluate()
    out["final"] = {
        "param_r2": round(float(
            ev["pigan_evaluation"]["parameter_prediction"]["r2"]), 4),
        "violation_rate": round(float(
            ev["structural_prediction_evaluation"]["param_range_violation_rate"]), 4),
        "cycle_err": round(float(
            ev["model_validation"]["cycle_consistency_error_mean"]), 4),
    }

    if args.compare_xla:
        t_x = Trainer(cfg, ds=trainer.ds, megakernel="off")
        t0 = time.perf_counter()
        out["xla_phases"] = _run_phases(t_x, build_phases(), args.force_gates, log)
        out["xla_total_wall_s"] = round(time.perf_counter() - t0, 1)
        ev_x = t_x.evaluate()
        out["xla_final"] = {
            "param_r2": round(float(
                ev_x["pigan_evaluation"]["parameter_prediction"]["r2"]), 4),
            "violation_rate": round(float(
                ev_x["structural_prediction_evaluation"]["param_range_violation_rate"]), 4),
        }

    ran = [p for p in out["phases"] if not p.get("skipped")]
    # ok = engagement + reliability + finiteness + the pipeline REACHED
    # useful quality at some phase.  The FINAL value is trajectory data,
    # not a gate: the unconditional constraint_finetune phase is
    # documented (RESULTS.md) to trade param R2 away for violation rate,
    # so a low final r2 after it is reference-parity behavior.
    best_r2 = max(
        (p["post_eval"]["param_r2"] for p in ran if p.get("post_eval")),
        default=float("-inf"),
    )
    out["best_phase_r2"] = best_r2
    out["ok"] = bool(
        out["fallback_trips"] == 0
        and all(math.isfinite(v) for v in out["final"].values())
        and best_r2 > 0.5
        and (not args.force_gates or len(ran) == len(out["phases"]))
    )
    print(json.dumps(out))
    return 0 if out["ok"] else 1


def supervise(args) -> int:
    cmd = [sys.executable, os.path.abspath(__file__), "--inner",
           "--num-samples", str(args.num_samples),
           "--epoch-scale", str(args.epoch_scale),
           "--seed", str(args.seed),
           "--megakernel", args.megakernel,
           ] + (["--cpu"] if args.cpu else []) \
             + (["--force-gates"] if args.force_gates else []) \
             + (["--compare-xla"] if args.compare_xla else [])
    for attempt in range(args.attempts):
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)
        try:
            out, _ = proc.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            print(f"attempt {attempt + 1} stalled; retrying", file=sys.stderr)
            continue
        lines = [ln for ln in out.splitlines() if ln.startswith("{")]
        if lines:
            sys.stdout.write(lines[-1] + "\n")
            return 0 if json.loads(lines[-1]).get("ok") else 1
        print(f"attempt {attempt + 1} rc={proc.returncode}:\n" + out[-3000:],
              file=sys.stderr)
    print(json.dumps({"ok": False, "error": "all attempts failed"}))
    return 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", action="store_true")
    ap.add_argument("--num-samples", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=42,
                    help="cfg.train.seed — vary to measure the run-to-run "
                         "spread of the program's final quality (the "
                         "constraint_finetune phase is documented to trade "
                         "param R2 chaotically; RESULTS.md)")
    ap.add_argument("--epoch-scale", type=int, default=1,
                    help="multiply every canonical phase's epoch count")
    ap.add_argument("--megakernel", default="force",
                    choices=("auto", "off", "force"))
    ap.add_argument("--force-gates", action="store_true",
                    help="run gated phases unconditionally (exercises the "
                         "emergency settings even on a healthy run)")
    ap.add_argument("--compare-xla", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--attempts", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()
    return run_inner(args) if args.inner else supervise(args)


if __name__ == "__main__":
    sys.exit(main())
