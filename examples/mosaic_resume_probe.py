"""Hardware validation: the megakernel survives checkpoint-resume at
DEFAULT settings with zero reliability-net trips.

Round-2 forensics: resuming a trained checkpoint with epochs_per_call=25 at
spe=15 decomposed into MIXED launch shapes (lax.scan of 3x120-grid + a
1x15-grid tail feeding the same aliased state buffers) and corrupted kernel
operands on v5e — the Trainer's net caught it and silently downgraded the
rest of the run to XLA.  Round 3 makes every launch uniform
(ops/megakernel.py _launch_plan); this probe reproduces the exact failure
scenario END TO END on hardware, repeatedly (a preemption-resume soak), and
demands ZERO fallback trips with the megakernel still engaged at the end.

    python examples/mosaic_resume_probe.py            # supervised, retries
    python examples/mosaic_resume_probe.py --inner --phase train ...

Prints one JSON line:
  {"ok": bool, "fallback_trips": N, "epochs": E, "param_r2": ..., ...}
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

def _jax_setup(cpu: bool = False):
    import jax

    if cpu:
        # the JAX_PLATFORMS env var is ignored under the axon plugin; the
        # config API reliably selects CPU (script-logic testing off-TPU)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return jax


def _save(mgr, step, t):
    """Idempotent save: a killed-after-save attempt leaves the step behind;
    the retry must not crash on it."""
    try:
        mgr.save(step, t.pigan_state, history=t.train_history, config=t.cfg)
    except Exception as e:  # orbax StepAlreadyExistsError
        if "already exists" not in str(e):
            raise
        print(f"checkpoint step {step} already exists (prior attempt); "
              "continuing", file=sys.stderr)


def _make_trainer(args):
    import dataclasses as dc

    from pigan_thz_tpu import default_config
    from pigan_thz_tpu.train import Trainer

    cfg = default_config()  # 1000 samples, batch 64 -> spe=15 (the shape)
    cfg = cfg.replace(
        train=dc.replace(cfg.train, num_epochs=args.total_epochs,
                         batch_size=args.batch),
        data=dc.replace(cfg.data, num_samples=args.num_samples),
    )
    return Trainer(cfg, epochs_per_call=25, megakernel=args.megakernel)


def run_phase(args) -> int:
    jax = _jax_setup(cpu=args.cpu)
    from pigan_thz_tpu.train import checkpoint as ckpt

    t = _make_trainer(args)
    mgr = ckpt.CheckpointManager(
        os.path.join(args.workdir, "ckpt"), save_interval=25
    )
    out: dict = {"phase": args.phase, "backend": jax.default_backend()}
    if args.phase == "train":
        existing = mgr.latest_epoch()
        if existing:
            # a prior attempt trained+saved before being killed (tunnel
            # stall AFTER the save) — idempotent skip, evidence comes
            # from the resume cycles
            print(json.dumps({**out, "ok": True, "fallback_trips": 0,
                              "mega_engaged": None, "skipped": True,
                              "epochs_total": existing}))
            mgr.close()
            return 0
        # forward pretrain under "auto": the GAN kernel is the probe's
        # subject, and forced forward-megakernel is invalid off-TPU
        # (in-kernel dropout needs the hardware PRNG)
        mk, t.megakernel = t.megakernel, (
            "auto" if args.megakernel == "force" else args.megakernel
        )
        t.pretrain_forward(epochs=args.fwd_epochs, log_every=10**9)
        t.megakernel = mk
        t.init_pigan()
        t.train_pigan(epochs=args.chunk_epochs, log_every=10**9,
                      checkpoint_manager=None, seed=0)
        start = args.chunk_epochs
        # explicit save (maybe_save's interval logic skips short phases)
        _save(mgr, start, t)
    else:  # resume: fresh process restores and continues — THE scenario
        mk, t.megakernel = t.megakernel, (
            "auto" if args.megakernel == "force" else args.megakernel
        )
        t.pretrain_forward(epochs=0)  # state template only
        t.megakernel = mk
        start = t.resume_from(mgr, "pigan")
        if start is None:
            print(json.dumps({"ok": False, "error": "no checkpoint"}))
            return 1
        t.train_pigan(epochs=args.chunk_epochs, log_every=10**9,
                      checkpoint_manager=None, seed=start)
        # save under the TOTAL epoch counter so the next resume advances
        _save(mgr, start + args.chunk_epochs, t)
        start = start + args.chunk_epochs
    mega_engaged = any(k[0] == "gan-mega" for k in t._epoch_fns)
    hist = t.train_history.get("pigan/g_loss", [])
    out.update(
        ok=(t.fallback_trips == 0 and mega_engaged),
        fallback_trips=t.fallback_trips,
        fallback_events=t.fallback_events,
        mega_engaged=mega_engaged,
        epochs_total=start,
        g_loss_last=(hist[-1] if hist else None),
    )
    if args.evaluate:
        ev = t.evaluate()
        out["param_r2"] = round(
            float(ev["pigan_evaluation"]["parameter_prediction"]["r2"]), 4
        )
    mgr.close()
    print(json.dumps(out))
    return 0 if out["ok"] else 1


def supervise(args) -> int:
    """Run train + N resume cycles, each in its own killable subprocess
    (tunnel-RPC drops freeze the client — CLAUDE.md gotchas)."""
    os.makedirs(args.workdir, exist_ok=True)
    total = {"fallback_trips": 0, "cycles": 0}
    phases = [("train", False)] + [
        ("resume", i == args.cycles - 1) for i in range(args.cycles)
    ]
    for phase, last in phases:
        cmd = [
            sys.executable, os.path.abspath(__file__), "--inner",
            "--phase", phase, "--workdir", args.workdir,
            "--chunk-epochs", str(args.chunk_epochs),
            "--fwd-epochs", str(args.fwd_epochs),
            "--total-epochs", str(args.total_epochs),
            "--num-samples", str(args.num_samples),
            "--batch", str(args.batch),
            "--megakernel", args.megakernel,
        ] + (["--evaluate"] if last else []) + (["--cpu"] if args.cpu else [])
        line = None
        for attempt in range(args.attempts):
            proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                    stderr=subprocess.STDOUT, text=True)
            try:
                out, _ = proc.communicate(timeout=args.timeout)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
                print(f"[{phase}] attempt {attempt + 1} stalled; retrying",
                      file=sys.stderr)
                continue
            lines = [ln for ln in out.splitlines() if ln.startswith("{")]
            if lines:
                # the inner prints its JSON only at completion — accept it
                # even with rc!=0 (ok:false), so a completed-but-tripped
                # attempt's trips are COUNTED rather than masked by the
                # idempotent-skip retry (round-3 forensics: the forward
                # trip hid behind exactly this)
                line = json.loads(lines[-1])
                break
            print(f"[{phase}] attempt {attempt + 1} rc={proc.returncode}:\n"
                  + out[-2000:], file=sys.stderr)
        if line is None:
            print(json.dumps({"ok": False, "error": f"{phase} failed"}))
            return 1
        total["fallback_trips"] += line.get("fallback_trips", 0)
        total["cycles"] += 1
        total["epochs_total"] = line.get("epochs_total")
        if "param_r2" in line:
            total["param_r2"] = line["param_r2"]
        print(f"[{phase}] -> {line}", file=sys.stderr)
    total["ok"] = total["fallback_trips"] == 0
    print(json.dumps(total))
    return 0 if total["ok"] else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", action="store_true")
    ap.add_argument("--phase", choices=["train", "resume"], default="train")
    ap.add_argument("--workdir", default="/tmp/mosaic_probe")
    ap.add_argument("--chunk-epochs", type=int, default=250,
                    help="epochs per process (kill/resume granularity)")
    ap.add_argument("--fwd-epochs", type=int, default=100)
    ap.add_argument("--cycles", type=int, default=11,
                    help="resume cycles after the initial train phase")
    ap.add_argument("--total-epochs", type=int, default=3000,
                    help="LR-schedule horizon (train.num_epochs)")
    ap.add_argument("--timeout", type=int, default=900,
                    help="per-attempt kill timeout; once compiles are "
                         "cached a healthy cycle takes ~90 s, so a tight "
                         "timeout + many attempts beats waiting out "
                         "tunnel stalls")
    ap.add_argument("--attempts", type=int, default=3)
    ap.add_argument("--evaluate", action="store_true")
    ap.add_argument("--num-samples", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=64,
                    help="batch size (e.g. 512 to soak the scaled-batch "
                         "recipe's kill/resume path)")
    ap.add_argument("--megakernel", default="auto",
                    choices=["auto", "off", "force"],
                    help="'force' lets the probe run interpreted off-TPU "
                         "(script-logic testing)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (script-logic testing)")
    args = ap.parse_args()
    if args.inner:
        return run_phase(args)
    return supervise(args)


if __name__ == "__main__":
    raise SystemExit(main())
