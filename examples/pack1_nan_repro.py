"""Forensic repro: pack=1 E=1 GAN megakernel on hardware.

The --vs-pack1 sweep saw fresh pack=1 compiles at E=1/2/4 return NaN
g_loss while their params came out bit-equal to the pack=5 run.  This
drives ONE shape in isolation: run pack1 E=1 twice, report every metric
key, param movement vs state0, and param delta between the two runs.
"""
import json
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
import numpy as np

import pigan_thz_tpu.ops.megakernel as MK
from pigan_thz_tpu import default_config
from pigan_thz_tpu.data import synthetic_dataset
from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.train import (
    StepSettings, init_forward_state, init_pigan_state, make_optimizers,
)

PACK = int(sys.argv[sys.argv.index("--pack")+1]) if "--pack" in sys.argv else 1
E = int(sys.argv[sys.argv.index("--epochs")+1]) if "--epochs" in sys.argv else 1

cfg = default_config()
ds = synthetic_dataset(cfg.data)
g, d, f = build_trio(cfg)
spe = ds.num_samples // cfg.train.batch_size
g_tx, d_tx, f_tx = make_optimizers(cfg, spe)
settings = StepSettings.from_config(cfg)
state0 = init_pigan_state(
    g, d, f, g_tx, d_tx, jax.random.PRNGKey(1),
    forward_variables=init_forward_state(f, f_tx, jax.random.PRNGKey(0)).f.variables,
)
p0 = [np.asarray(jax.device_get(x)) for x in jax.tree.leaves(state0.g.params)]

MK._PACK_MAX = PACK
fn = MK.make_pallas_multi_epoch_fn(cfg, settings)
key, ones = jax.random.PRNGKey(7), jnp.ones((E,), jnp.float32)

def _tree_max_delta(xs, ys):
    """NaN-PROPAGATING max |x - y| across leaf pairs (Python max() masks
    NaN — max(0.0, nan) is 0.0 — the probe bug class from round 3b)."""
    return float(np.max(np.array(
        [np.max(np.abs(a - b)) for a, b in zip(xs, ys)]
    )))


for trial in range(2):
    st, m = fn(jax.tree.map(jnp.copy, state0), ds, key, ones)
    mets = {k: np.asarray(jax.device_get(m[k])) for k in MK.METRIC_KEYS}
    pt = [np.asarray(jax.device_get(x)) for x in jax.tree.leaves(st.g.params)]
    moved = _tree_max_delta(pt, p0)
    params_finite = bool(all(np.all(np.isfinite(a)) for a in pt))
    metrics_finite = bool(all(np.all(np.isfinite(v)) for v in mets.values()))
    print(f"--- trial {trial} (pack_max={PACK}, E={E}) ---")
    for k, v in mets.items():
        print(f"  {k:>20}: {np.array2string(v, precision=5)} "
              f"finite={bool(np.all(np.isfinite(v)))}")
    print(f"  g-param max|move| vs state0: {moved:.3e} "
          f"params_finite={params_finite}")
    if trial == 0:
        prev, prev_m = pt, mets
    else:
        ddet = _tree_max_delta(pt, prev)
        fin_keys = [k for k in mets if np.all(np.isfinite(mets[k]))
                    and np.all(np.isfinite(prev_m[k]))]
        mdet = (max(float(np.max(np.abs(prev_m[k] - mets[k])))
                    for k in fin_keys) if fin_keys else float("nan"))
        print(f"  run-to-run param delta: {ddet:.3e}  metric delta: {mdet:.3e}"
              f"  ({len(fin_keys)}/{len(mets)} metric keys finite both runs)")
        print(json.dumps({"probe": "pack1_nan_repro", "pack_max": PACK,
                          "epochs": E, "param_moved": moved,
                          "params_finite": params_finite,
                          "metrics_finite": metrics_finite,
                          "run_to_run_delta": ddet}))
