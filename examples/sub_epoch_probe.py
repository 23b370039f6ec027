"""Hardware probe: the sub-epoch megakernel path on a LARGE dataset.

Round 3 lifted the megakernel's spe <= 120 dataset boundary: when
steps_per_epoch exceeds the multi-launch grid cap, each epoch decomposes
into uniform sub-epoch launches of the largest divisor of spe within the
cap (ops/megakernel.py _launch_plan).  This probe validates the new shape
class END TO END on hardware at the 20k-sample scale the native CSV parser
targets (spe=312 at batch 64 -> launches of 52), and — with
--num-samples past ~240k (spe > _MAX_PROGRAM_GRID) — the round-3c chained
GAN sub-epoch driver (make_pallas_subepoch_fn: each epoch as spe/L chained
single-launch jitted calls; the JSON's `mega_sub` reports engagement):

  1. parity: megakernel vs XLA trajectories from the SAME state over the
     same key stream (fresh state AND checkpoint-restored state — the
     historical corruption recipe);
  2. reliability: zero fallback trips, megakernel still engaged;
  3. throughput: steady-state steps/s for both backends.

    python examples/sub_epoch_probe.py            # supervised, retries

Prints one JSON line: {"ok": bool, ...}.
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

    import jax.numpy as jnp

    from pigan_thz_tpu import default_config
    from pigan_thz_tpu.train import Trainer, checkpoint as ckpt

    cfg = default_config()
    cfg = cfg.replace(
        train=dc.replace(cfg.train, num_epochs=args.horizon),
        data=dc.replace(cfg.data, num_samples=args.num_samples),
    )
    mk = args.megakernel
    epc = args.chunk_epochs
    if args.pin_caps:
        # pre-root-cause caps: forces the sub-epoch decomposition / gated
        # padding branches that the lifted defaults (single-launch
        # programs to _MAX_GRID=3750) no longer reach from the Trainer —
        # this keeps the retained machinery hardware-probeable
        from pigan_thz_tpu.ops import megakernel as MK

        MK._MAX_GRID, MK._MAX_GRID_MULTI = 120, 75
        MK._MAX_PROGRAM_GRID = 1500

    out: dict = {"backend": jax.default_backend(),
                 "num_samples": args.num_samples,
                 "pinned_caps": bool(args.pin_caps)}

    # --- A: fresh-state parity: two trainers, same seeds, different
    # backends ------------------------------------------------------------
    t_m = Trainer(cfg, epochs_per_call=epc, megakernel=mk)
    spe = t_m.steps_per_epoch
    out["spe"] = spe
    # forward pretrain under "auto": the GAN kernel is the probe's subject
    t_m.megakernel = "auto" if mk == "force" else mk
    t_m.pretrain_forward(epochs=args.fwd_epochs, log_every=10**9)
    t_m.megakernel = mk
    t_m.init_pigan()
    fstate = t_m.forward_state

    t_x = Trainer(cfg, ds=t_m.ds, epochs_per_call=epc, megakernel="off")
    t_x.forward_state = jax.tree.map(jnp.copy, fstate)
    t_x.init_pigan()

    E = args.gan_epochs
    t0 = time.time()
    t_m.train_pigan(epochs=E, log_every=10**9, seed=0)
    out["mega_wall_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    t_x.train_pigan(epochs=E, log_every=10**9, seed=0)
    out["xla_wall_s"] = round(time.time() - t0, 1)

    hm = {k: [float(x) for x in v] for k, v in t_m.train_history.items()
          if k.startswith("pigan/")}
    hx = {k: [float(x) for x in v] for k, v in t_x.train_history.items()
          if k.startswith("pigan/")}
    finite = all(math.isfinite(x) for v in hm.values() for x in v)
    # parity bound: the corruption mode is O(1)-wrong from step 0; fp
    # ordering noise compounds slowly (test suite: <= 0.5% at epoch 25)
    gl_m, gl_x = hm["pigan/g_loss"], hx["pigan/g_loss"]
    rel = max(abs(a - b) / max(abs(b), 1e-3) for a, b in zip(gl_m, gl_x))
    out.update(
        mega_engaged=any(
            k[0] in ("gan-mega", "gan-mega-sub") for k in t_m._epoch_fns),
        mega_sub=any(k[0] == "gan-mega-sub" for k in t_m._epoch_fns),
        fallback_trips=t_m.fallback_trips,
        fallback_events=t_m.fallback_events,
        finite=finite,
        g_loss_rel_err=round(rel, 4),
        g_loss_last=[round(gl_m[-1], 4), round(gl_x[-1], 4)],
    )

    # --- B: checkpoint-restore parity (the corruption recipe) ------------
    mgr = ckpt.CheckpointManager(os.path.join(args.workdir, "ckpt"),
                                 save_interval=1)
    try:
        mgr.save(E, t_m.pigan_state, history=t_m.train_history, config=cfg)
    except Exception as e:
        if "already exists" not in str(e):
            raise
    t_r = Trainer(cfg, ds=t_m.ds, epochs_per_call=epc, megakernel=mk)
    t_r.megakernel = "auto" if mk == "force" else mk
    t_r.pretrain_forward(epochs=0)  # state template only
    t_r.megakernel = mk
    start = t_r.resume_from(mgr, "pigan")
    t_r.train_pigan(epochs=E, log_every=10**9, seed=start)
    hr = {k: [float(x) for x in v] for k, v in t_r.train_history.items()
          if k.startswith("pigan/")}
    out.update(
        resume_finite=all(math.isfinite(x) for v in hr.values() for x in v),
        resume_trips=t_r.fallback_trips,
        resume_events=t_r.fallback_events,
        resume_mega=any(
            k[0] in ("gan-mega", "gan-mega-sub") for k in t_r._epoch_fns),
    )
    mgr.close()

    # --- C: steady-state throughput (per-chunk best-of, device_get sync) -
    def rate(t, n=6):
        from pigan_thz_tpu.train import make_pigan_step
        from pigan_thz_tpu.train.steps import StepSettings

        settings = StepSettings.from_config(cfg)
        fn = t._maybe_megakernel(settings, None)
        Ec = epc
        if fn is None:
            step = make_pigan_step(
                t.generator, t.discriminator, t.forward_model,
                t.g_tx, t.d_tx, settings, t.ds.param_lo, t.ds.param_hi,
            )
            fn = t._make_multi_epoch(
                step, with_scale=True, cache_key=("probe", settings)
            )
        elif not getattr(fn, "sub_epoch", False):
            # the chained sub-epoch driver (datasets past the one-program
            # envelope) bounds its per-call launches internally
            Ec = t._mega_gan_chunk_cap(epc)
        ones = jnp.ones((Ec,), jnp.float32)
        st = jax.tree.map(jnp.copy, t.pigan_state)
        st, m = fn(st, t.ds, jax.random.PRNGKey(0), ones)  # warm
        jax.device_get(m["d_loss"])
        best = 0.0
        for i in range(n):
            tt = time.perf_counter()
            st, m = fn(st, t.ds, jax.random.PRNGKey(i), ones)
            jax.device_get(m["d_loss"])
            best = max(best, Ec * spe / (time.perf_counter() - tt))
        return best

    try:
        out["mega_steps_per_s"] = round(rate(t_m), 1)
        out["xla_steps_per_s"] = round(rate(t_x), 1)
    except Exception as e:  # timing is informative, not gating
        out["rate_error"] = str(e)[:200]

    out["ok"] = bool(
        finite and out["resume_finite"] and out["mega_engaged"]
        and out["resume_mega"] and t_m.fallback_trips == 0
        and t_r.fallback_trips == 0 and rel < 0.05
    )
    print(json.dumps(out))
    return 0 if out["ok"] else 1


def supervise(args) -> int:
    os.makedirs(args.workdir, exist_ok=True)
    cmd = [sys.executable, os.path.abspath(__file__), "--inner",
           "--workdir", args.workdir,
           "--num-samples", str(args.num_samples),
           "--gan-epochs", str(args.gan_epochs),
           "--fwd-epochs", str(args.fwd_epochs),
           "--chunk-epochs", str(args.chunk_epochs),
           "--horizon", str(args.horizon),
           "--megakernel", args.megakernel,
           ] + (["--cpu"] if args.cpu else []) \
             + (["--pin-caps"] if args.pin_caps else [])
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
        print(f"attempt {attempt + 1} rc={proc.returncode}:\n" + out[-2000:],
              file=sys.stderr)
    print(json.dumps({"ok": False, "error": "all attempts failed"}))
    return 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", action="store_true")
    ap.add_argument("--workdir", default="/tmp/sub_epoch_probe")
    ap.add_argument("--num-samples", type=int, default=20000)
    ap.add_argument("--gan-epochs", type=int, default=8)
    ap.add_argument("--fwd-epochs", type=int, default=15)
    ap.add_argument("--chunk-epochs", type=int, default=4)
    ap.add_argument("--horizon", type=int, default=100)
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument("--attempts", type=int, default=3)
    ap.add_argument("--megakernel", default="force",
                    choices=["auto", "force"])
    ap.add_argument("--pin-caps", action="store_true",
                    help="pin the pre-root-cause caps (120/75/1500) so the "
                         "sub-epoch decomposition and gated-padding paths "
                         "actually engage (the lifted defaults run these "
                         "dataset sizes as single launches)")
    ap.add_argument("--cpu", action="store_true",
                    help="script-logic testing off-TPU (interpret mode)")
    args = ap.parse_args()
    if args.inner:
        return run_inner(args)
    return supervise(args)


if __name__ == "__main__":
    raise SystemExit(main())
