"""Hardware forensic: megakernel GAN QUALITY vs XLA across StepSettings.

Round-3c finding: on v5e the GAN megakernel trains gan_standard
(train/programs.py:140-145 — the progressive pipeline's main GAN phase,
detach_forward=False, recon 5 / spec 2 / maxwell 2 / range 5) to param R2
~0.18 where the XLA backend reaches ~0.69 from the same state — while
interpret mode reproduces XLA exactly (kernel semantics are right) and the
default-recipe soaks (detach_forward=True, recon 100) reach R2 0.99 through
the same kernel.  Finite-but-wrong, hardware-only: the corruption class the
round-2 reliability net cannot see.

This probe isolates the trigger with a controlled matrix: ONE XLA-trained
surrogate F shared by every arm, then (settings-variant x backend) GAN
trainings from identical inits, 200 epochs each:

  std_nodetach   gan_standard as-is          (detach_forward=False)
  std_detach     gan_standard + detach=True  (isolates the detach knob)
  default        StepSettings.from_config    (known-good control)
  def_nodetach   default + detach=False      (detach under default weights)

    python examples/gan_quality_probe.py                # supervised, retries
    python examples/gan_quality_probe.py --variants std_nodetach,default

Prints one JSON line:
  {"ok": bool, "variants": {name: {"mega_r2": .., "xla_r2": .., ...}}}
ok = every variant's mega R2 within --tol of its XLA R2 (GAN training is
chaotic; R2 gaps > ~0.2 are the corruption signal, fp-noise gaps are <0.05).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

_ALL = ("std_nodetach", "std_detach", "default", "def_nodetach")


def run_inner(args) -> int:
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import dataclasses as dc
    import time

    import jax.numpy as jnp

    from pigan_thz_tpu import default_config
    from pigan_thz_tpu.train import Trainer
    from pigan_thz_tpu.train.programs import standard_phases
    from pigan_thz_tpu.train.steps import StepSettings

    cfg = default_config()
    cfg = cfg.replace(data=dc.replace(cfg.data, num_samples=args.num_samples))
    phases = standard_phases(100, args.gan_epochs)
    std = phases[1].gan_settings
    dflt = StepSettings.from_config(cfg)
    variants = {
        "std_nodetach": std,
        "std_detach": dc.replace(std, detach_forward=True),
        "default": dflt,
        "def_nodetach": dc.replace(dflt, detach_forward=False),
    }
    wanted = [v.strip() for v in args.variants.split(",")] if args.variants else list(_ALL)

    # ONE surrogate shared by every arm — trained on XLA by default
    # (removes the forward-kernel variable from the matrix); pass
    # --fwd-backend force to train it with the FORWARD megakernel instead
    # (hardware-PRNG dropout) and so test THAT kernel's surrogate quality
    # through the downstream GAN sensitivity.
    t0 = time.perf_counter()
    base = Trainer(cfg, megakernel=args.fwd_backend)
    base.pretrain_forward(
        epochs=100, settings=phases[0].forward_settings, log_every=10**9
    )
    fstate = base.forward_state

    # direct surrogate quality: full-dataset spectrum MSE of the frozen F
    # (F predicts RAW dB spectra from normalized params — steps.py:181-182)
    ds = base.ds
    fvars = {"params": fstate.f.params, **fstate.f.extra}
    pred = jax.jit(
        lambda v, p: base.forward_model.apply(v, p, train=False)
    )(fvars, ds.params_norm)
    pred_spec = pred[0] if isinstance(pred, (tuple, list)) else pred
    f_mse = float(jnp.mean((pred_spec - ds.spectra) ** 2))

    out: dict = {
        "backend": jax.default_backend(),
        "fwd_backend": args.fwd_backend,
        "num_samples": args.num_samples,
        "gan_epochs": args.gan_epochs,
        "fwd_wall_s": round(time.perf_counter() - t0, 1),
        "f_spec_mse": round(f_mse, 6),
        "variants": {},
    }

    def arm(settings, mode):
        t = Trainer(cfg, ds=base.ds, megakernel=mode)
        t.forward_state = jax.tree.map(jnp.copy, fstate)
        t.init_pigan()
        t0 = time.perf_counter()
        t.train_pigan(epochs=args.gan_epochs, settings=settings, log_every=10**9)
        wall = round(time.perf_counter() - t0, 1)
        ev = t.evaluate()
        return {
            "r2": round(float(
                ev["pigan_evaluation"]["parameter_prediction"]["r2"]), 4),
            "cycle": round(float(
                ev["model_validation"]["cycle_consistency_error_mean"]), 4),
            "wall_s": wall,
            "trips": t.fallback_trips,
        }

    ok = True
    for name in wanted:
        s = variants[name]
        m = arm(s, "force" if not args.cpu else "force")
        x = arm(s, "off")
        gap = abs(m["r2"] - x["r2"])
        row = {
            "mega_r2": m["r2"], "xla_r2": x["r2"], "gap": round(gap, 4),
            "mega_cycle": m["cycle"], "xla_cycle": x["cycle"],
            "mega_wall_s": m["wall_s"], "xla_wall_s": x["wall_s"],
            "trips": m["trips"],
            "detach_forward": bool(s.detach_forward),
        }
        row["ok"] = bool(
            gap < args.tol and m["trips"] == 0
            and math.isfinite(m["r2"]) and math.isfinite(x["r2"])
        )
        ok = ok and row["ok"]
        out["variants"][name] = row
        print(f"[{name}] mega={m['r2']} xla={x['r2']} gap={gap:.3f}",
              file=sys.stderr, flush=True)

    out["ok"] = ok
    print(json.dumps(out))
    return 0 if ok else 1


def supervise(args) -> int:
    cmd = [sys.executable, os.path.abspath(__file__), "--inner",
           "--num-samples", str(args.num_samples),
           "--gan-epochs", str(args.gan_epochs),
           "--tol", str(args.tol),
           "--fwd-backend", args.fwd_backend,
           ] + (["--variants", args.variants] if args.variants else []) \
             + (["--cpu"] if args.cpu else [])
    for attempt in range(args.attempts):
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)
        try:
            outp, _ = proc.communicate(timeout=args.timeout)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            print(f"attempt {attempt + 1} stalled; retrying", file=sys.stderr)
            continue
        lines = [ln for ln in outp.splitlines() if ln.startswith("{")]
        if lines:
            sys.stdout.write(lines[-1] + "\n")
            return 0 if json.loads(lines[-1]).get("ok") else 1
        print(f"attempt {attempt + 1} rc={proc.returncode}:\n" + outp[-3000:],
              file=sys.stderr)
    print(json.dumps({"ok": False, "error": "all attempts failed"}))
    return 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", action="store_true")
    ap.add_argument("--num-samples", type=int, default=1000)
    ap.add_argument("--gan-epochs", type=int, default=200)
    ap.add_argument("--variants", default="",
                    help="comma list from: " + ",".join(_ALL))
    ap.add_argument("--tol", type=float, default=0.15,
                    help="max |mega_r2 - xla_r2| counted as parity")
    ap.add_argument("--fwd-backend", default="off",
                    choices=("off", "force"),
                    help="backend that trains the shared surrogate F")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--attempts", type=int, default=3)
    ap.add_argument("--timeout", type=int, default=3600)
    args = ap.parse_args()
    return run_inner(args) if args.inner else supervise(args)


if __name__ == "__main__":
    sys.exit(main())
