"""Hardware probe: how large can a single megakernel launch grid be?

Round-2 forensics observed corrupt operands at >= ~375 grid steps per
launch when the input state came from a restored checkpoint; _MAX_GRID=120
was chosen conservatively under that cloud.  Round 3 made all launches
uniform (the other corruption trigger); this probe re-tests the
single-launch sizes from a RESTORED trained state — the original failure
recipe — so the cap can be raised (or kept) on evidence.

For each candidate grid size G: restore the checkpoint, run one
multi-epoch call of E = G/spe epochs with _MAX_GRID=G (single launch),
check every metric and the state stay finite, and compare the first
epoch's g_loss against the XLA path from the same state (loose bound: the
corruption mode is O(1)-wrong from step 0, not subtly off).

    python examples/grid_cap_probe.py --workdir /tmp/mosaic_probe \
        --grids 120,240,375,600,900

Prints one JSON line per grid and a summary line.
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


def run_one(args) -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import dataclasses as dc

    import jax.numpy as jnp

    from pigan_thz_tpu import default_config
    from pigan_thz_tpu.ops import megakernel as MK
    from pigan_thz_tpu.train import Trainer, checkpoint as ckpt

    G = args.grid
    cfg = default_config()
    cfg = cfg.replace(train=dc.replace(cfg.train, num_epochs=3000))
    t = Trainer(cfg, epochs_per_call=25, megakernel="off")
    t.pretrain_forward(epochs=0)
    mgr = ckpt.CheckpointManager(os.path.join(args.workdir, "ckpt"),
                                 save_interval=25)
    start = t.resume_from(mgr, "pigan")
    if start is None:
        print(json.dumps({"ok": False, "error": "no checkpoint; run "
                          "mosaic_resume_probe.py first"}))
        return 1
    spe = t.steps_per_epoch
    E = max(1, G // spe)
    if args.fused:
        # control: the pre-round-3 single-program shape (prologue fused
        # with the aliased pallas_call) — the shape every original cap
        # measurement was taken under
        MK._FUSED_PROLOGUE = True
    if args.multi_grid:
        # n scanned launches of multi_grid steps each (e.g. --grid 360
        # --multi-grid 120 = the round-3 corrupting 3x120 scan shape)
        MK._MAX_GRID = args.multi_grid
        MK._MAX_GRID_MULTI = args.multi_grid
    else:
        MK._MAX_GRID = E * spe  # exactly one launch of E*spe grid steps

    from pigan_thz_tpu.train.steps import StepSettings

    settings = StepSettings.from_config(cfg)
    state_b = jax.tree.map(jnp.copy, t.pigan_state)
    pallas = MK.make_pallas_multi_epoch_fn(cfg, settings)
    ones = jnp.ones((E,), jnp.float32)
    key = jax.random.PRNGKey(123)
    st_p, m_p = pallas(t.pigan_state, t.ds, key, ones)
    rows = {k: [float(x) for x in v] for k, v in jax.device_get(m_p).items()}
    finite = all(math.isfinite(x) for v in rows.values() for x in v)
    state_finite = t._state_finite(st_p)

    # XLA cross-check of epoch 1 from the identical state
    from pigan_thz_tpu.train import (make_multi_epoch_fn, make_optimizers,
                                     make_pigan_step)

    g_tx, d_tx, _ = make_optimizers(cfg, spe)
    step = make_pigan_step(t.generator, t.discriminator, t.forward_model,
                           g_tx, d_tx, settings, t.ds.param_lo, t.ds.param_hi)
    xla = make_multi_epoch_fn(step, cfg.train.batch_size, with_scale=True)
    _, m_x = xla(state_b, t.ds, key, ones[:1])
    gl_p = rows["g_loss"][0]
    gl_x = float(jax.device_get(m_x["g_loss"])[0])
    close = abs(gl_p - gl_x) <= 0.05 * max(abs(gl_x), 1.0)
    out = {
        "grid": E * spe, "epochs": E, "resumed_at": start,
        "multi_grid": args.multi_grid or None, "fused": bool(args.fused),
        "finite": finite, "state_finite": bool(state_finite),
        "g_loss_pallas_ep1": round(gl_p, 5), "g_loss_xla_ep1": round(gl_x, 5),
        "ok": bool(finite and state_finite and close),
    }
    print(json.dumps(out))
    mgr.close()
    return 0


def supervise(args) -> int:
    grids = [int(g) for g in args.grids.split(",")]
    results = []
    for g in grids:
        cmd = [sys.executable, os.path.abspath(__file__), "--inner",
               "--grid", str(g), "--workdir", args.workdir]
        if args.multi_grid:
            cmd += ["--multi-grid", str(args.multi_grid)]
        if args.fused:
            cmd.append("--fused")
        line = None
        for attempt in range(3):
            proc = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                    stderr=subprocess.STDOUT, text=True)
            try:
                out, _ = proc.communicate(timeout=args.timeout)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
                print(f"[grid {g}] attempt {attempt + 1} stalled; retrying",
                      file=sys.stderr)
                continue
            lines = [ln for ln in out.splitlines() if ln.startswith("{")]
            if lines:
                line = json.loads(lines[-1])
                break
            print(f"[grid {g}] rc={proc.returncode}:\n" + out[-1500:],
                  file=sys.stderr)
        results.append(line or {"grid": g, "ok": False, "error": "failed"})
        print(f"[grid {g}] -> {results[-1]}", file=sys.stderr)
    print(json.dumps({"results": results,
                      "all_ok": all(r.get("ok") for r in results)}))
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", action="store_true")
    ap.add_argument("--grid", type=int, default=120)
    ap.add_argument("--multi-grid", type=int, default=0,
                    help="scanned launches of this size instead of one "
                         "launch of --grid (grid/multi-grid launches)")
    ap.add_argument("--fused", action="store_true",
                    help="fused-prologue control shape (_FUSED_PROLOGUE)")
    ap.add_argument("--grids", default="120,240,375,600,900")
    ap.add_argument("--workdir", default="/tmp/mosaic_probe")
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args()
    if args.inner:
        return run_one(args)
    return supervise(args)


if __name__ == "__main__":
    raise SystemExit(main())
