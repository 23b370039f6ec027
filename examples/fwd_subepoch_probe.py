"""Hardware probe: the forward-pretrain SUB-EPOCH megakernel driver.

The forward kernel's Mosaic bound is per-PROGRAM (_FWD_MAX_TOTAL=105);
the sub-epoch driver (round 3) chains one-launch jitted calls of L grid
steps per call.  This probe drives `Trainer.pretrain_forward` with
megakernel='force' over a matrix of (num_samples, L-cap) shapes and
reports, per shape: engagement, fallback trips, finiteness, and the
final loss vs an XLA run of the same seeds — isolating which per-call
grid sizes are clean on real hardware for both the ungated (divisor)
and gated (prime spe, padded tail call) plans.

    python examples/fwd_subepoch_probe.py --shapes 20000:0 20032:0 20032:45

Each SHAPE is "num_samples:cap" (cap 0 = the shipped _FWD_MAX_TOTAL).
Prints one JSON line per shape plus a summary line.
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


def run_inner(args) -> int:
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import dataclasses as dc
    import time

    from pigan_thz_tpu import default_config
    from pigan_thz_tpu.ops import megakernel as MK
    from pigan_thz_tpu.train import Trainer

    num_samples, cap = args.shape
    if cap:
        MK._FWD_MAX_TOTAL = cap

    cfg = default_config()
    cfg = cfg.replace(data=dc.replace(cfg.data, num_samples=num_samples))
    out: dict = {"backend": jax.default_backend(), "num_samples": num_samples,
                 "cap": cap or MK._FWD_MAX_TOTAL}

    t = Trainer(cfg, megakernel="force")
    spe = t.steps_per_epoch
    L, spe_pad = MK._fwd_sub_plan(spe)
    out.update(spe=spe, L=L, spe_pad=spe_pad, gated=spe_pad != spe)
    t0 = time.time()
    t.pretrain_forward(epochs=args.epochs, log_every=10**9)
    out["mega_wall_s"] = round(time.time() - t0, 1)
    hist = [float(x) for x in t.train_history["forward/loss"]]
    out.update(
        mega_engaged=any(k[0] == "fwd-mega" for k in t._epoch_fns),
        fallback_trips=t.fallback_trips,
        fallback_events=t.fallback_events,
        finite=all(math.isfinite(x) for x in hist),
        loss_first=round(hist[0], 4), loss_last=round(hist[-1], 4),
    )

    tx = Trainer(cfg, ds=t.ds, megakernel="off")
    tx.pretrain_forward(epochs=args.epochs, log_every=10**9)
    hx = [float(x) for x in tx.train_history["forward/loss"]]
    out["xla_loss_last"] = round(hx[-1], 4)
    # dropout bitstreams differ (hardware PRNG vs jax.random): compare at
    # trajectory scale, not per-step parity
    rel = abs(hist[-1] - hx[-1]) / max(abs(hx[-1]), 1e-6)
    out["loss_rel_err"] = round(rel, 4)
    out["ok"] = bool(
        out["mega_engaged"] and out["finite"]
        and t.fallback_trips == 0 and rel < 0.25
    )
    print(json.dumps(out))
    return 0 if out["ok"] else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=str, default="")
    ap.add_argument("--shapes", nargs="+", default=["20000:0", "20032:0"])
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--attempts", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.inner:
        ns, cap = (int(x) for x in args.inner.split(":"))
        args.shape = (ns, cap)
        return run_inner(args)

    results = []
    for shape in args.shapes:
        got = None
        for attempt in range(args.attempts):
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--inner", shape, "--epochs", str(args.epochs)]
            if args.cpu:
                cmd.append("--cpu")
            proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                    stderr=subprocess.STDOUT, text=True)
            try:
                outp, _ = proc.communicate(timeout=args.timeout)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
                print(f"{shape}: attempt {attempt + 1} stalled", file=sys.stderr)
                continue
            lines = [ln for ln in outp.splitlines() if ln.startswith("{")]
            if lines:
                got = json.loads(lines[-1])
                break
            print(f"{shape}: rc={proc.returncode}\n" + outp[-1500:],
                  file=sys.stderr)
        results.append({"shape": shape, **(got or {"ok": False, "error": "no output"})})
        print(json.dumps(results[-1]), flush=True)
    print(json.dumps({"summary": [(r["shape"], r.get("ok")) for r in results]}))
    return 0 if all(r.get("ok") for r in results) else 1


if __name__ == "__main__":
    raise SystemExit(main())
