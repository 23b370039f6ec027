"""Benchmark: fused PI-GAN training throughput on the available accelerator.

Baseline: the reference trains on CPU at ~1.3-2 steps/s (16 batches of 64 in
8-13 s/epoch; timestamps in
logs/PIGAN_train_20250711-215855/PIGAN_train.log — see BASELINE.md).  We use
the generous end of that range (2.0 steps/s) as the denominator.

The benchmark reproduces the reference workload shape — 1000-sample dataset,
batch 64, 15 full-batch optimizer steps per epoch (the ragged 16th partial
batch is dropped for a static step shape), full alternating D+G update with
all physics losses — and times whole jitted epoch-scans after warmup.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _ROOT)

import jax

# Persistent compilation cache: first-time compiles through the remote
# tunnel take minutes and occasionally stall; cached runs start instantly.
# (The config API takes effect reliably where the env vars do not.)
jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

BASELINE_STEPS_PER_SEC = 2.0  # reference CPU upper bound


def main() -> None:
    import jax.numpy as jnp

    from pigan_thz_tpu import default_config
    from pigan_thz_tpu.data import synthetic_dataset
    from pigan_thz_tpu.models import build_trio
    from pigan_thz_tpu.train import (
        StepSettings,
        init_forward_state,
        init_pigan_state,
        make_epoch_fn,
        make_forward_step,
        make_multi_epoch_fn,
        make_optimizers,
        make_pigan_step,
    )

    from pigan_thz_tpu.ops.megakernel import (
        make_pallas_multi_epoch_fn,
        supports_megakernel,
    )

    cfg = default_config()  # 1000 samples, batch 64 — the reference workload
    import dataclasses as _dc

    def _dtype_flag(flag: str, field: str):
        nonlocal cfg
        if flag not in sys.argv:  # ablation knobs (driver runs with no args)
            return
        try:
            dtype = sys.argv[sys.argv.index(flag) + 1]
        except IndexError:
            raise SystemExit(f"{flag} needs a value: float32 | bfloat16")
        if dtype not in ("float32", "bfloat16"):
            raise SystemExit(f"{flag} {dtype!r}: use float32 | bfloat16")
        cfg = cfg.replace(train=_dc.replace(cfg.train, **{field: dtype}))

    _dtype_flag("--dtype", "compute_dtype")          # matmul operand dtype
    _dtype_flag("--adam-dtype", "adam_state_dtype")  # Adam m/v storage dtype
    ds = synthetic_dataset(cfg.data)
    g, d, f = build_trio(cfg)
    steps_per_epoch = ds.num_samples // cfg.train.batch_size
    g_tx, d_tx, f_tx = make_optimizers(cfg, steps_per_epoch)

    # brief forward pretrain so the GAN step runs on realistic weights
    fs = init_forward_state(f, f_tx, jax.random.PRNGKey(0))
    fepoch = make_epoch_fn(make_forward_step(f, f_tx), cfg.train.batch_size)
    for e in range(5):
        fs, _ = fepoch(fs, ds, jax.random.PRNGKey(100 + e))

    state = init_pigan_state(
        g, d, f, g_tx, d_tx, jax.random.PRNGKey(1),
        forward_variables=fs.f.variables,
    )
    settings = StepSettings.from_config(cfg)
    # Production fast path: the VMEM-resident Pallas whole-epoch megakernel
    # (ops/megakernel.py) — 16.7 us/step vs 41.9 us for the best XLA variant
    # on v5e-1 (RESULTS.md "Megakernel").  Falls back to the XLA multi-epoch
    # scan off-TPU or outside the kernel's settings envelope.
    use_mega = (
        jax.default_backend() == "tpu"
        and supports_megakernel(cfg, settings) is None
    )
    chunk = 100
    if use_mega:
        multi_epoch = make_pallas_multi_epoch_fn(cfg, settings)
    else:
        step = make_pigan_step(
            g, d, f, g_tx, d_tx, settings, ds.param_lo, ds.param_hi,
        )
        multi_epoch = make_multi_epoch_fn(
            step, cfg.train.batch_size, with_scale=True, unroll=steps_per_epoch
        )
    ones = jnp.ones((chunk,), jnp.float32)
    backend = "megakernel" if use_mega else "xla"
    print(f"bench backend: {backend} ({jax.default_backend()})", file=sys.stderr)

    # warmup (compile + first executions)
    for w in range(2):
        state, m = multi_epoch(state, ds, jax.random.PRNGKey(2 + w), ones)
    # hard host sync: through the TPU relay tunnel, block_until_ready alone
    # has been observed returning before execution finishes (round-2 notes);
    # device_get of a result is the sound barrier
    import math

    mets = jax.device_get(m)
    # NaN check on the warmup chunk: a corrupt fast path must not be timed
    if not all(math.isfinite(float(x)) for v in mets.values() for x in v):
        raise RuntimeError(f"non-finite warmup metrics on {backend} path")

    # tunnel round-trip latency: varies session to session (measured 0-30
    # ms); reported so the record shows what the chain amortizes away.
    # Must fetch a FRESH device value — re-fetching an already-pulled
    # array reads host-side cache, not the tunnel.
    rtt_ms = 1e9
    for r in range(3):
        fresh = jnp.float32(r) + 1.0
        t0 = time.perf_counter()
        jax.device_get(fresh)
        rtt_ms = min(rtt_ms, 1000.0 * (time.perf_counter() - t0))

    # timed: N measurements, each a back-to-back CHAIN of chunk calls with
    # ONE device_get barrier at the end.  Each chunk call is a single
    # pallas launch (100 epochs x 15 spe = 1500 grid steps, inside
    # _MAX_PROGRAM_GRID=3750); async dispatch pipelines the chain on-device, so
    # the tunnel RTT is paid once per chain instead of once per chunk
    # (round-3 finding: per-chunk sync under-read the device rate by up to
    # 2x on a 30 ms-RTT tunnel day; the device rate itself was unchanged).
    # Best-of + spread still excludes tunnel hiccups from the headline.
    n_meas = 5
    chain = 20
    rates = []
    for e in range(n_meas):
        t0 = time.perf_counter()
        for c in range(chain):
            state, m = multi_epoch(
                state, ds, jax.random.PRNGKey(10 + e * chain + c), ones
            )
        jax.device_get(m["d_loss"])
        dt = time.perf_counter() - t0
        rates.append(chain * chunk * steps_per_epoch / dt)
    rates.sort()
    best = rates[-1]
    median = rates[n_meas // 2]

    # Utilization accounting (round-4): analytic FLOPs/bytes for this
    # exact (cfg, settings) workload -> TFLOP/s, MFU vs the device's MXU
    # peak, and streamed HBM bandwidth.  Names the absolute-speed story
    # alongside the steps/s ratio (ops/costs.py; RESULTS.md roofline).
    from pigan_thz_tpu.ops.costs import (
        device_peak_flops,
        device_peak_hbm,
        pigan_step_costs,
    )

    costs = pigan_step_costs(cfg, settings)
    kind = jax.devices()[0].device_kind
    peak = device_peak_flops(kind)
    peak_hbm = device_peak_hbm(kind)
    tflops = costs.model_flops * best / 1e12
    hbm_bytes = (
        costs.stream_bytes if backend == "megakernel" else costs.xla_hbm_bytes
    )
    util = {
        "flops_per_step": costs.model_flops,
        "tflops_per_sec": round(tflops, 2),
        "hbm_gbps": round(hbm_bytes * best / 1e9, 1),
        "state_resident_mb": round(costs.state_bytes / 1e6, 1),
        "device_kind": kind,
    }
    if peak is not None:
        util["mfu_pct"] = round(100.0 * tflops * 1e12 / peak, 1)
    if peak_hbm is not None:
        util["hbm_util_pct"] = round(100.0 * hbm_bytes * best / peak_hbm, 1)
    print(
        json.dumps(
            {
                "metric": "pigan_train_steps_per_sec",
                "value": round(best, 2),
                "unit": "steps/s",
                "vs_baseline": round(best / BASELINE_STEPS_PER_SEC, 2),
                "backend": backend,
                "median": round(median, 2),
                "spread_pct": round(100.0 * (best - rates[0]) / best, 1),
                "n_chains": n_meas,
                "chunks_per_chain": chain,
                "epochs_per_chunk": chunk,
                "compute_dtype": cfg.train.compute_dtype,
                "adam_state_dtype": cfg.train.adam_state_dtype,
                "tunnel_rtt_ms": round(rtt_ms, 1),
                **util,
            }
        )
    )


def _run_supervised() -> int:
    """Run the measurement in a killable subprocess with retries.

    The TPU relay tunnel occasionally drops an RPC, leaving the client
    frozen on a futex forever (CLAUDE.md "Environment gotchas").  The driver
    runs bench.py unattended, so the top-level process supervises: on stall
    it kills the child and retries — the persistent compile cache makes a
    retry start warm, so a post-compile retry finishes in well under a
    minute."""
    import subprocess

    for attempt, budget in enumerate((900, 700, 500)):
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--inner"]
            + [a for a in sys.argv[1:] if a != "--inner"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        try:
            out, _ = proc.communicate(timeout=budget)
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            print(
                f"bench attempt {attempt + 1} stalled after {budget}s "
                "(tunnel RPC drop?); retrying",
                file=sys.stderr,
            )
            continue
        sys.stdout.write(out)
        if proc.returncode == 0 and '"metric"' in out:
            return 0
        print(f"bench attempt {attempt + 1} failed (rc={proc.returncode})",
              file=sys.stderr)
    # all attempts stalled or died (e.g. the TPU relay tunnel wedged at
    # device init — observed 2026-08-17: jax.devices() futex-hangs for
    # hours): still emit ONE parseable JSON line so the round record shows
    # a diagnosed environment failure, not a missing file
    print(json.dumps({
        "metric": "pigan_train_steps_per_sec", "value": 0.0,
        "unit": "steps/s", "vs_baseline": 0.0,
        "error": "all bench attempts stalled (TPU tunnel unavailable)",
    }))
    return 1


if __name__ == "__main__":
    if "--inner" in sys.argv:
        main()
    else:
        raise SystemExit(_run_supervised())
