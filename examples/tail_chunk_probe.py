"""Hardware probe: Trainer-driven GAN runs whose epoch count leaves a
SMALL TAIL CHUNK — the exact production shape behind every round-2/3
resume-tail fallback trip (grids < 120 at pack=1 miscompile on v5e;
ops/megakernel.py _MIN_CLEAN_GRID).  With adaptive step packing the tail
programs compile packed (e.g. grid 30 -> 6 iterations of pack=5) and the
whole run stays on the megakernel.

    python examples/tail_chunk_probe.py [--epochs 27 29] [--spe13]

--spe13: 832-sample dataset (spe=13, prime -> no pack divisor): asserts
the tail chunk takes the PLANNED XLA route (not a fallback trip) and the
run finishes finite with the megakernel still engaged for full chunks.
"""
import dataclasses as dc
import json
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import numpy as np

from pigan_thz_tpu import default_config
from pigan_thz_tpu.data import synthetic_dataset
from pigan_thz_tpu.train import Trainer

epochs_list = [27, 29]
if "--epochs" in sys.argv:
    i = sys.argv.index("--epochs") + 1
    epochs_list = []
    while i < len(sys.argv) and sys.argv[i].isdigit():
        epochs_list.append(int(sys.argv[i]))
        i += 1

cfg = default_config()
if "--spe13" in sys.argv:
    cfg = cfg.replace(data=dc.replace(cfg.data, num_samples=13 * 64))

results = []
for epochs in epochs_list:
    ds = synthetic_dataset(cfg.data)
    t = Trainer(cfg, ds=ds, epochs_per_call=25, megakernel="auto")
    t.pretrain_forward(epochs=0)
    t.init_pigan()
    t.train_pigan(epochs=epochs, log_every=10**9)
    hist = t.train_history["pigan/g_loss"]
    finite = bool(np.all(np.isfinite(np.asarray(hist))))
    engaged = any(k[0] == "gan-mega" for k in t._epoch_fns)
    row = {
        "epochs": epochs, "spe": t.steps_per_epoch, "finite": finite,
        "rows": len(hist), "fallback_trips": t.fallback_trips,
        "megakernel_engaged": engaged,
        "ok": finite and t.fallback_trips == 0 and engaged
        and len(hist) == epochs,
    }
    print(json.dumps(row), flush=True)
    results.append(row)

ok = all(r["ok"] for r in results)
print(json.dumps({"probe": "tail_chunk", "ok": ok}))
sys.exit(0 if ok else 1)
