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


def run_bisect(args) -> int:
    """Drive the production sub_call one jitted call at a time with a host
    SYNC + full-state finiteness check between calls, so the exact failing
    call index (and whether syncing changes it) is observable.

        python examples/fwd_subepoch_probe.py --bisect 20000:0 \
            [--calls 3] [--no-sync] [--dropout 0.0]
    """
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import dataclasses as dc

    import jax.numpy as jnp
    import numpy as np

    from pigan_thz_tpu import default_config
    from pigan_thz_tpu.data import synthetic_dataset
    from pigan_thz_tpu.models import build_trio
    from pigan_thz_tpu.ops import megakernel as MK
    from pigan_thz_tpu.train import (
        ForwardStepSettings, init_forward_state, make_optimizers,
    )

    ns, cap = (int(x) for x in args.bisect.split(":"))
    if cap:
        MK._FWD_MAX_TOTAL = cap
    if args.debug_lanes:
        MK._DEBUG_LANES = True
    if args.no_alias:
        MK._NO_ALIAS = True
    if args.no_donate:
        MK._NO_DONATE = True
    if args.fused_prologue:
        MK._FUSED_PROLOGUE = True
    cfg = default_config()
    cfg = cfg.replace(
        data=dc.replace(cfg.data, num_samples=ns),
        forward_model=dc.replace(cfg.forward_model, dropout_rate=args.dropout),
    )
    ds = synthetic_dataset(cfg.data)
    _, _, f = build_trio(cfg)
    B = cfg.train.batch_size
    spe = ds.num_samples // B
    _, _, f_tx = make_optimizers(cfg, spe)
    L, spe_pad = MK._fwd_sub_plan(spe)
    n_sub = spe_pad // L
    tail_live = L - (spe_pad - spe)
    print(json.dumps({"backend": jax.default_backend(), "spe": spe, "L": L,
                      "n_sub": n_sub, "tail_live": tail_live,
                      "drop": args.dropout, "sync": not args.no_sync}),
          flush=True)

    fn = MK.make_pallas_forward_subepoch_fn(
        cfg, ForwardStepSettings(), interpret=args.cpu
    )

    def check(st, mrow, tag):
        bad = []
        for p, x in jax.tree_util.tree_leaves_with_path(st):
            xv = jax.device_get(x)
            if np.issubdtype(xv.dtype, np.floating) and not np.all(
                np.isfinite(xv)
            ):
                bad.append(jax.tree_util.keystr(p))
        m = jax.device_get(mrow)
        rec = {"call": tag, "state_nonfinite": bad[:6],
               "mrow_finite": bool(np.all(np.isfinite(m))),
               "loss": round(float(m[0]), 5), "ok": not bad}
        if args.debug_lanes:
            base = len(MK.FWD_METRIC_KEYS)
            rec["dbg"] = {
                k: float(m[base + j])
                for j, k in enumerate(MK.FWD_DEBUG_KEYS)
            }
        print(json.dumps(rec), flush=True)
        return not bad

    st = init_forward_state(f, f_tx, jax.random.PRNGKey(2))
    key_e = jax.random.PRNGKey(0)
    mrow = None
    for j in range(min(args.calls, n_sub)):
        live = tail_live if j == n_sub - 1 else L
        off = j * L if args.static_offset else None
        call = fn._calls.setdefault((live, off), fn._mk_sub_call(live, off))
        skey = jax.random.fold_in(key_e, 0x5EED + j)
        st, mrow = call(st, ds, key_e, skey, jnp.int32(j * L))
        if not args.no_sync and not check(st, mrow, j):
            print(json.dumps({"verdict": f"NONFINITE at call {j} (synced)"}))
            return 1
    if args.no_sync and not check(st, mrow, "final"):
        print(json.dumps({"verdict": "NONFINITE (async chain)"}))
        return 1
    print(json.dumps({"verdict": "CLEAN"}))
    return 0


def run_xla_chain(args) -> int:
    """Relay-race discriminator: chain the plain XLA forward epoch fn
    (no Pallas anywhere) as N rapid donated one-epoch calls WITHOUT host
    syncs — the same dispatch pattern as the sub-epoch driver.  If THIS
    corrupts on hardware, the trigger is the tunnel/relay's handling of
    rapid in-flight donated programs, not the Pallas kernel.

        python examples/fwd_subepoch_probe.py --xla-chain 1024 --calls 12
    """
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import dataclasses as dc

    import jax.numpy as jnp
    import numpy as np

    from pigan_thz_tpu import default_config
    from pigan_thz_tpu.data import synthetic_dataset
    from pigan_thz_tpu.models import build_trio
    from pigan_thz_tpu.train import (
        init_forward_state, make_forward_step, make_multi_epoch_fn,
        make_optimizers,
    )

    cfg = default_config()
    cfg = cfg.replace(data=dc.replace(cfg.data, num_samples=int(args.xla_chain)))
    ds = synthetic_dataset(cfg.data)
    _, _, f = build_trio(cfg)
    spe = ds.num_samples // cfg.train.batch_size
    _, _, f_tx = make_optimizers(cfg, spe)
    st = init_forward_state(f, f_tx, jax.random.PRNGKey(2))
    fn = make_multi_epoch_fn(make_forward_step(f, f_tx), cfg.train.batch_size,
                             with_scale=False, unroll=1)
    ones = jnp.ones((1,), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), args.calls)
    last = None
    for j in range(args.calls):
        st, last = fn(st, ds, keys[j], ones)          # async, donated chain
    losses = np.asarray(jax.device_get(last["loss"]))
    bad = []
    for p, x in jax.tree_util.tree_leaves_with_path(st):
        xv = jax.device_get(x)
        if np.issubdtype(xv.dtype, np.floating) and not np.all(np.isfinite(xv)):
            bad.append(jax.tree_util.keystr(p))
    out = {"backend": jax.default_backend(), "spe": spe, "calls": args.calls,
           "loss_last": round(float(losses[-1]), 5),
           "state_nonfinite": bad[:6], "ok": not bad and
           bool(np.all(np.isfinite(losses)))}
    print(json.dumps(out), flush=True)
    print(json.dumps({"verdict": "CLEAN" if out["ok"] else
                      "NONFINITE (XLA async donated chain)"}))
    return 0 if out["ok"] else 1


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
    ap.add_argument("--bisect", type=str, default="",
                    help="ns:cap — drive sub_calls one at a time with syncs")
    ap.add_argument("--xla-chain", type=str, default="",
                    help="ns — chain donated XLA epoch calls, no Pallas")
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--no-sync", action="store_true")
    ap.add_argument("--static-offset", action="store_true",
                    help="bake offsets into programs (no dynamic_slice)")
    ap.add_argument("--debug-lanes", action="store_true",
                    help="in-kernel stage checksums in the metric row")
    ap.add_argument("--dropout", type=float, default=0.0)
    ap.add_argument("--no-alias", action="store_true",
                    help="disable pallas input/output aliasing (extra copies)")
    ap.add_argument("--no-donate", action="store_true",
                    help="jit sub-calls without donate_argnums")
    ap.add_argument("--fused-prologue", action="store_true",
                    help="reproduce the corrupting single-program shape "
                         "(prologue fused with the pallas call)")
    ap.add_argument("--shapes", nargs="+", default=["20000:0", "20032:0"])
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--attempts", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.bisect:
        return run_bisect(args)
    if args.xla_chain:
        return run_xla_chain(args)
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
