"""Hardware probe: M-member PACKED megakernel (one launch trains M members).

The round-4 latency-headroom experiment (VERDICT r3 #1): the solo kernel
runs at 16.5% MFU / 1% HBM utilization — latency-bound, not resource-
bound — so make_pallas_ensemble_fn co-locates M members' state in VMEM
and runs M independent per-step op chains per grid step, betting that
Mosaic overlaps their pipeline bubbles.  This probe measures whether the
bet pays: aggregate member-steps/s for M in {1, 2, 4, 8} on one chip,
plus a hardware parity check of packed members against solo runs.

    python examples/member_packed_probe.py --parity        # M=2 vs solo
    python examples/member_packed_probe.py --speed         # M sweep
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
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from pigan_thz_tpu import default_config
from pigan_thz_tpu.data import synthetic_dataset
from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.ops.megakernel import (
    make_pallas_ensemble_fn,
    make_pallas_multi_epoch_fn,
)
from pigan_thz_tpu.train import (
    StepSettings,
    init_pigan_state,
    make_optimizers,
)


def _fresh_states(cfg, spe, n, key):
    g, d, f = build_trio(cfg)
    g_tx, d_tx, _ = make_optimizers(cfg, spe)
    shared_f = init_pigan_state(
        g, d, f, g_tx, d_tx, jax.random.fold_in(key, 0),
        spectrum_dim=cfg.data.spectrum_dim, param_dim=cfg.data.param_dim,
    ).f.variables
    return [
        init_pigan_state(
            g, d, f, g_tx, d_tx, jax.random.fold_in(key, m),
            spectrum_dim=cfg.data.spectrum_dim,
            param_dim=cfg.data.param_dim, forward_variables=shared_f,
        )
        for m in range(n)
    ]


def run_parity(cfg, ds, settings, spe) -> dict:
    """M=2 packed vs two solo runs, 4 epochs, on hardware."""
    E = 4
    key = jax.random.PRNGKey(3)
    k_init, k_train = jax.random.split(key)
    ones = jnp.ones((E,), jnp.float32)

    ens = make_pallas_ensemble_fn(cfg, settings, 2)
    states = _fresh_states(cfg, spe, 2, k_init)
    out_states, out_metrics = ens(states, ds, k_train, ones)
    out_metrics = jax.device_get(out_metrics)

    solo = make_pallas_multi_epoch_fn(cfg, settings)
    res = {"ok": True, "max_rel": 0.0, "exact": True}
    for m in range(2):
        st = _fresh_states(cfg, spe, 2, k_init)[m]
        st, mets = solo(st, ds, jax.random.fold_in(k_train, m), ones)
        mets = jax.device_get(mets)
        for k in mets:
            a = np.asarray(mets[k])
            b = np.asarray(out_metrics[m][k])
            if not np.array_equal(a, b):
                res["exact"] = False
            denom = np.maximum(np.abs(a), 1e-8)
            rel = float(np.max(np.abs(a - b) / denom))
            # NaN-propagating accumulate (CLAUDE.md: max(0.0, nan) == 0.0
            # silently masks corruption in probe reductions)
            res["max_rel"] = float(np.maximum(res["max_rel"], rel))
            if not (np.isfinite(b).all() and rel < 1e-4):
                res["ok"] = False
                res.setdefault("bad", []).append((m, k, rel))
        # full-state check vs solo
        pa = np.concatenate([
            np.asarray(x).ravel() for x in jax.tree.leaves(st.g.params)
        ])
        pb = np.concatenate([
            np.asarray(x).ravel()
            for x in jax.tree.leaves(jax.device_get(out_states[m].g.params))
        ])
        rel = float(np.max(np.abs(pa - pb) / np.maximum(np.abs(pa), 1e-8)))
        res[f"member{m}_param_max_rel"] = rel
        if not (np.isfinite(pb).all() and rel < 1e-3):
            res["ok"] = False
    return res


def run_speed(cfg, ds, settings, spe, members_list, chunk, chain, n_meas) -> list:
    rows = []
    key = jax.random.PRNGKey(5)
    ones = jnp.ones((chunk,), jnp.float32)
    for M in members_list:
        if M == 1:
            fn = make_pallas_multi_epoch_fn(cfg, settings)
            st = _fresh_states(cfg, spe, 1, key)[0]

            def call(s, k):
                return fn(s, ds, k, ones)

            carry = st
        else:
            fn = make_pallas_ensemble_fn(cfg, settings, M)
            carry = _fresh_states(cfg, spe, M, key)

            def call(s, k):
                return fn(s, ds, k, ones)

        t_c0 = time.time()
        for w in range(2):   # warmup: compile + 2 executions
            carry, mets = call(carry, jax.random.PRNGKey(100 + w))
        host = jax.device_get(mets)
        compile_s = time.time() - t_c0
        flat = host if M == 1 else host[0]
        finite = all(np.isfinite(np.asarray(v)).all() for v in flat.values())
        if M > 1:
            finite = finite and all(
                np.isfinite(np.asarray(v)).all()
                for mm in host for v in mm.values()
            )
        if not finite:
            rows.append({"members": M, "error": "non-finite warmup metrics"})
            continue
        rates = []
        for e in range(n_meas):
            t0 = time.perf_counter()
            for c in range(chain):
                carry, mets = call(
                    carry, jax.random.PRNGKey(1000 + e * chain + c))
            probe = mets["d_loss"] if M == 1 else mets[0]["d_loss"]
            jax.device_get(probe)
            dt = time.perf_counter() - t0
            rates.append(M * chain * chunk * spe / dt)
        rates.sort()
        rows.append({
            "members": M,
            "agg_steps_per_s": round(rates[-1], 1),
            "median": round(rates[len(rates) // 2], 1),
            "per_member": round(rates[-1] / M, 1),
            "us_per_packed_step": round(1e6 * M / rates[-1], 2),
            "warmup_s": round(compile_s, 1),
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--speed", action="store_true")
    ap.add_argument("--members", type=str, default="1,2,4")
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--n-meas", type=int, default=3)
    args = ap.parse_args()

    cfg = default_config()
    ds = synthetic_dataset(cfg.data)
    spe = ds.num_samples // cfg.train.batch_size
    settings = StepSettings.from_config(cfg)
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}), flush=True)

    out = {}
    if args.parity or not args.speed:
        out["parity"] = run_parity(cfg, ds, settings, spe)
        print(json.dumps({"parity": out["parity"]}), flush=True)
    if args.speed:
        out["speed"] = run_speed(
            cfg, ds, settings, spe,
            [int(x) for x in args.members.split(",")],
            args.chunk, args.chain, args.n_meas,
        )
    print("RESULT " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
