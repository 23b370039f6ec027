"""Hardware probe: what does the mesh path cost on ONE chip?

VERDICT r3 #3(b): the multi-chip layer is correctness-proven (virtual
8-device tests, HLO collective contract, hybrid 2-process run) but no
number existed for the overhead of the mesh(1,1) parallel epoch versus
the unmeshed XLA epoch on a single real device.  This probe times both
paths with the bench methodology (chained async chunk calls, ONE
device_get barrier, tunnel RTT reported) on identical work:

    python examples/mesh_overhead_probe.py            # defaults
    python examples/mesh_overhead_probe.py --chunk 20 --chain 10

Both paths run the same fused D->G step (train/steps.py) over the same
synthetic dataset with the same keys; the meshed path adds the
with_sharding_constraint placements and jit-under-Mesh compilation of
parallel/sharding.py:make_parallel_multi_epoch_fn.  On mesh(1,1) every
constraint is a no-op placement, so any rate difference IS the mesh
plumbing overhead (reference has no counterpart: single-process torch,
SURVEY section 2.2).
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

if "--cpu" in sys.argv:  # smoke-test off-device (JAX_PLATFORMS env is ignored)
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

from pigan_thz_tpu import default_config
from pigan_thz_tpu.data import synthetic_dataset
from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.parallel import make_mesh
from pigan_thz_tpu.parallel.sharding import (
    make_parallel_multi_epoch_fn,
    replicate_dataset,
    shard_state,
)
from pigan_thz_tpu.train import (
    StepSettings,
    init_pigan_state,
    make_multi_epoch_fn,
    make_optimizers,
    make_pigan_step,
)


def _measure(fn, state, ds, chunk: int, chain: int, n_meas: int):
    """Chained async chunk calls, one device_get barrier (bench.py
    pattern — block_until_ready through the tunnel is unsound)."""
    ones = jnp.ones((chunk,), jnp.float32)
    t0 = time.time()
    for w in range(2):  # compile + settle
        state, m = fn(state, ds, jax.random.PRNGKey(10 + w), ones)
    jax.device_get(m["d_loss"])
    warm_s = time.time() - t0
    rates = []
    for e in range(n_meas):
        t0 = time.perf_counter()
        for c in range(chain):
            state, m = fn(state, ds, jax.random.PRNGKey(100 + e * chain + c),
                          ones)
        jax.device_get(m["d_loss"])
        rates.append(1.0 / (time.perf_counter() - t0))
    rates.sort()
    return rates, warm_s, state


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=10, help="epochs per call")
    ap.add_argument("--chain", type=int, default=10, help="calls per timing")
    ap.add_argument("--n-meas", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test on host CPU (handled at import)")
    args = ap.parse_args()

    cfg = default_config()
    ds = synthetic_dataset(cfg.data)
    spe = ds.spectra.shape[0] // cfg.train.batch_size
    g, d, f = build_trio(cfg)
    g_tx, d_tx, _ = make_optimizers(cfg, spe)
    settings = StepSettings.from_config(cfg)

    def fresh_state():
        return init_pigan_state(
            g, d, f, g_tx, d_tx, jax.random.PRNGKey(0),
            spectrum_dim=cfg.data.spectrum_dim,
            param_dim=cfg.data.param_dim,
        )

    step = make_pigan_step(g, d, f, g_tx, d_tx, settings,
                           ds.param_lo, ds.param_hi)
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0]),
                      "n_devices": jax.device_count()}), flush=True)

    # tunnel RTT floor
    rtt_ms = 1e9
    one = jax.device_put(jnp.ones(()))
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(one)
        rtt_ms = min(rtt_ms, 1000.0 * (time.perf_counter() - t0))

    steps_per_call = args.chunk * spe
    rows = {}

    # --- unmeshed baseline --------------------------------------------------
    fn = make_multi_epoch_fn(step, cfg.train.batch_size,
                             with_scale=True, unroll=3)
    rates, warm_s, _ = _measure(fn, fresh_state(), ds,
                                args.chunk, args.chain, args.n_meas)
    un_best = rates[-1] * args.chain * steps_per_call
    rows["unmeshed"] = {
        "steps_per_s_best": round(un_best, 1),
        "steps_per_s_median": round(
            rates[len(rates) // 2] * args.chain * steps_per_call, 1),
        "warmup_s": round(warm_s, 1),
    }
    print(json.dumps({"unmeshed": rows["unmeshed"]}), flush=True)

    # --- mesh(1,1) ----------------------------------------------------------
    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    pfn = make_parallel_multi_epoch_fn(step, cfg.train.batch_size, mesh,
                                       with_scale=True, unroll=3)
    mds = replicate_dataset(ds, mesh)
    mstate = shard_state(fresh_state(), mesh)
    rates, warm_s, _ = _measure(pfn, mstate, mds,
                                args.chunk, args.chain, args.n_meas)
    me_best = rates[-1] * args.chain * steps_per_call
    rows["mesh_1x1"] = {
        "steps_per_s_best": round(me_best, 1),
        "steps_per_s_median": round(
            rates[len(rates) // 2] * args.chain * steps_per_call, 1),
        "warmup_s": round(warm_s, 1),
    }
    print(json.dumps({"mesh_1x1": rows["mesh_1x1"]}), flush=True)

    overhead_pct = 100.0 * (un_best - me_best) / un_best
    out = {
        "probe": "mesh_overhead",
        "spe": spe,
        "chunk": args.chunk,
        "chain": args.chain,
        "tunnel_rtt_ms": round(rtt_ms, 1),
        "unmeshed": rows["unmeshed"],
        "mesh_1x1": rows["mesh_1x1"],
        "mesh_overhead_pct": round(overhead_pct, 1),
    }
    print("RESULT " + json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
