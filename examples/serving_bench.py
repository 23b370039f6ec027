"""Serving-cycle throughput across the dtype ladder (fp32 / bf16 / int8).

Methodology (RESULTS.md "Serving measurements"): host-driven identical-arg
microbenchmarks through the TPU relay tunnel are INVALID (RPC-level
caching), so each timing dispatches a device-side stream of N DISTINCT
pre-staged batches asynchronously and syncs ONCE via `jax.device_get` of
the last output; best of R repeats is reported.  The fp32/bf16 numbers
reproduce the round-2 table; int8 is the round-3 addition
(ops/quantized.py — post-training quantization onto the v5e int8 MXU).

Usage:  python examples/serving_bench.py [--batches 8192 65536] [--stream 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np


def measure(fn, batches, repeats: int = 5) -> float:
    """Best wall-clock seconds to stream all batches through fn (async
    dispatch, one device_get sync)."""
    out = fn(batches[0])
    jax.device_get(jax.tree.leaves(out)[0])  # warm compile + device sync
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        last = None
        for x in batches:
            last = fn(x)
        jax.device_get(jax.tree.leaves(last)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8192, 65536])
    ap.add_argument("--stream", type=int, default=32)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--models", default=None,
                    help="saved_models dir (default: fresh-init weights — "
                    "throughput is weight-value independent)")
    args = ap.parse_args()

    from pigan_thz_tpu import default_config
    from pigan_thz_tpu.data import synthetic_dataset
    from pigan_thz_tpu.models import build_trio
    from pigan_thz_tpu.serve import make_inverse_design_fn

    cfg = default_config()
    ds = synthetic_dataset(cfg.data, key=jax.random.PRNGKey(7))
    g, d, f = build_trio(cfg)
    if args.models:
        from pigan_thz_tpu.train.trainer import Trainer

        tr = Trainer(cfg)
        tr.load_final(args.models)
        gv = tr.pigan_state.g.variables
        fv = tr.pigan_state.f.variables
    else:
        k = jax.random.PRNGKey(0)
        gv = g.init(k, ds.spectra[:2], train=False)
        fv = f.init({"params": k, "dropout": k}, ds.params_norm[:2], train=False)

    print(f"platform: {jax.devices()[0].platform} ({jax.devices()[0]})")
    variants = [
        ("fp32", dict()),
        ("bf16", dict(compute_dtype=jnp.bfloat16)),
        ("int8", dict(compute_dtype="int8")),
    ]
    for B in args.batches:
        keys = jax.random.split(jax.random.PRNGKey(3), args.stream)
        batches = [
            jax.random.uniform(kk, (B, ds.spectrum_dim), jnp.float32)
            for kk in keys
        ]
        batches = [jax.device_put(x) for x in batches]
        jax.device_get(batches[-1][0, 0])
        row = {}
        outs = {}
        for name, kw in variants:
            fn = make_inverse_design_fn(g, f, gv, fv, ds, **kw)
            sec = measure(fn, batches, repeats=args.repeats)
            per_batch_ms = sec / args.stream * 1e3
            row[name] = per_batch_ms
            outs[name] = jax.device_get(fn(batches[0]))
            print(
                f"B={B:6d}  {name}:  {per_batch_ms:7.3f} ms/batch   "
                f"{B / (per_batch_ms / 1e3) / 1e6:8.2f} M spectra/s"
            )
        # accuracy vs fp32 on the same batch (normalized-param space)
        p32 = outs["fp32"][0]
        span = np.asarray(jax.device_get(ds.param_hi - ds.param_lo))
        for name in ("bf16", "int8"):
            err = np.max(np.abs(outs[name][0] - p32) / span[None, :])
            print(f"            {name} param err (frac of range): {err:.4f}")
        print(
            f"            speedups vs fp32: bf16 {row['fp32'] / row['bf16']:.2f}x"
            f"  int8 {row['fp32'] / row['int8']:.2f}x"
        )


if __name__ == "__main__":
    main()
