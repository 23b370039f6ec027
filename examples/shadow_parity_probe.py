"""Hardware validation: the shadow-parity net passes CLEAN on the real chip.

The net (Trainer(shadow_parity="first"), default on) replays the first
megakernel chunk of each kind on the XLA path from the same state/rng and
trips on first-epoch metric mismatch (trainer.py _shadow_replay) — the
finite-but-wrong corruption class round-3d exposed.  Interpret-mode parity
is 8e-5/2e-6 (forward/gan worst rel diff); this probe measures the REAL
hardware residual (fp reassociation between Mosaic and XLA program order +
hardware-PRNG dropout masks) and demands every check passes with the
megakernel still engaged — i.e. the default-on net never fires spuriously.

    python examples/shadow_parity_probe.py                  # first-chunk mode
    python examples/shadow_parity_probe.py --mode all       # every chunk
    python examples/shadow_parity_probe.py --cpu            # logic check off-TPU

Prints one JSON line:
  {"ok": bool, "backend": ..., "trips": N, "checks": [...],
   "fwd_worst_rel": ..., "gan_worst_rel": ..., "wall_s": ...}
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100, help="per phase")
    ap.add_argument("--mode", choices=("first", "all"), default="first")
    ap.add_argument("--num-samples", type=int, default=1000)
    ap.add_argument("--dropout", type=float, default=None,
                    help="override forward-model dropout (default config)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_ROOT, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from pigan_thz_tpu import default_config
    from pigan_thz_tpu.train import Trainer

    cfg = default_config()
    cfg = cfg.replace(
        train=dc.replace(cfg.train, num_epochs=args.epochs),
        data=dc.replace(cfg.data, num_samples=args.num_samples),
    )
    if args.dropout is not None:
        cfg = cfg.replace(
            forward_model=dc.replace(
                cfg.forward_model, dropout_rate=args.dropout
            )
        )

    # force: off-TPU the auto policy never engages the kernel (no checks to
    # validate); force engages the interpret kernel there and is identical
    # to auto on TPU for the default (eligible) config
    t = Trainer(cfg, epochs_per_call=25, megakernel="force",
                shadow_parity=args.mode)
    t0 = time.time()
    t.pretrain_forward(epochs=args.epochs)
    t.train_pigan(epochs=args.epochs)
    wall = time.time() - t0

    checks = t.shadow_checks
    by_kind = {
        kind: max(
            (c["worst_rel"] for c in checks if c["what"] == kind),
            default=None,
        )
        for kind in ("forward", "pigan")
    }
    out = {
        "ok": (
            t.fallback_trips == 0
            and bool(checks)
            and all(c["ok"] for c in checks)
        ),
        "backend": jax.default_backend(),
        "mode": args.mode,
        "epochs": args.epochs,
        "trips": t.fallback_trips,
        "events": t.fallback_events,
        "n_checks": len(checks),
        "fwd_worst_rel": by_kind["forward"],
        "gan_worst_rel": by_kind["pigan"],
        "checks": checks,
        "wall_s": round(wall, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
