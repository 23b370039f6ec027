"""Time stripped megakernel variants on hardware to locate the per-step cost.

Usage: python examples/kernel_ablate_probe.py [noop|dphase|nogbwd|noadam|full]

Variants monkeypatch megakernel._make_kernel; each preserves the real
signature, grid, BlockSpecs, aliasing, and the metrics write, but executes
only part of the step body:
  noop    — empty body (one trivial reduction so nothing folds away):
            measures pure per-grid-step orchestration cost
  dphase  — G forward + full D phase (fwd+bwd+Adam)
  nogbwd  — dphase + frozen-F forward (everything except G backprop)
  noadam  — nogbwd with plain SGD instead of Adam on D
  full    — the real kernel (sanity anchor)
Timing = bench.py methodology (chains of async chunk calls, one sync).
Measured v5e-1 (round 3): noop 5.85 us/step vs full 17.2 — one third of
the step is grid overhead; motivates step packing (RESULTS.md).
"""
import sys, os, time, json
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
import jax.numpy as jnp
from pigan_thz_tpu import default_config
from pigan_thz_tpu.data import synthetic_dataset
from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.train import (StepSettings, init_forward_state, init_pigan_state,
                                 make_optimizers)
import pigan_thz_tpu.ops.megakernel as MK
from pigan_thz_tpu.ops.megakernel import LANE, _up, pl, pltpu

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "full"

real_make_kernel = MK._make_kernel

def stripped_make_kernel(S, B, steps_per_epoch, settings, clip, bf16=False,
                         row_steps=None, padded=False, pack=1):
    if VARIANT == "full":
        return real_make_kernel(S, B, steps_per_epoch, settings, clip, bf16,
                                row_steps, padded, pack)
    if pack != 1:
        # stripped bodies model one step per grid iteration; probe at full
        # grids (>= _MIN_CLEAN_GRID) where _resolve_pack returns 1
        raise SystemExit(f"stripped variants require pack=1, got {pack}")
    W = _up(S + 4)
    rs = row_steps or steps_per_epoch
    n_state = 18
    adam_apply = MK._make_adam(MK._B1, MK._B2, clip)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    def kernel(*refs):
        it = iter(refs)
        spec_ref, par_ref, met_ref, sched_ref = (next(it) for _ in range(4))
        lo_ref, hi_ref = next(it), next(it)
        frozen = [next(it) for _ in range(24)]
        for _ in range(n_state):
            next(it)
        train = [next(it) for _ in range(16)]
        stats = [next(it) for _ in range(2)]
        metrics_ref = next(it)

        i = pl.program_id(0)
        sched_row = sched_ref[0]
        lr_g, lr_d = sched_row[0, 0], sched_row[0, 1]
        inv1_g, inv2_g = sched_row[0, 2], sched_row[0, 3]
        inv1_d, inv2_d = sched_row[0, 4], sched_row[0, 5]
        spectra = spec_ref[0]
        acc = jnp.sum(spectra) * 0.0

        (g_w1, g_b1, g_gam1, g_bet1, g_w2, g_b2, g_gam2, g_bet2,
         g_w3, g_b3, d_w1, d_b1, d_w2, d_b2, d_w3, d_b3) = train

        if VARIANT in ("dphase", "nogbwd", "noadam"):
            # G fwd (2 matmuls + BN) ---------------------------------
            u1 = mm(spectra, g_w1[0]) + g_b1[0]
            mu1 = jnp.mean(u1, axis=0, keepdims=True)
            var1 = jnp.maximum(0.0, jnp.mean(u1*u1, axis=0, keepdims=True) - mu1*mu1)
            a1 = jnp.maximum((u1 - mu1) * jax.lax.rsqrt(var1 + 1e-5) * g_gam1[0] + g_bet1[0], 0.0)
            u2 = mm(a1, g_w2[0]) + g_b2[0]
            mu2 = jnp.mean(u2, axis=0, keepdims=True)
            var2 = jnp.maximum(0.0, jnp.mean(u2*u2, axis=0, keepdims=True) - mu2*mu2)
            a2 = jnp.maximum((u2 - mu2) * jax.lax.rsqrt(var2 + 1e-5) * g_gam2[0] + g_bet2[0], 0.0)
            blane = jax.lax.broadcasted_iota(jnp.int32, (B, LANE), 1)
            z3 = jnp.broadcast_to(g_b3[0], (B, LANE))
            for k in range(4):
                z3 = z3 + jnp.where(blane == k, jnp.sum(a2 * g_w3[0][k:k+1,:], axis=1, keepdims=True), 0.0)
            pn = jnp.tanh(z3)
            # D phase fwd+bwd+adam ------------------------------------
            x0 = jnp.concatenate([spectra, spectra], axis=0)
            p1 = mm(x0, d_w1[0]) + d_b1[0]
            h1 = jnp.where(p1 >= 0, p1, 0.2 * p1)
            p2 = mm(h1, d_w2[0]) + d_b2[0]
            h2 = jnp.where(p2 >= 0, p2, 0.2 * p2)
            w3row = d_w3[0][0:1, :]
            z = jnp.sum(h2 * w3row, axis=1, keepdims=True) + d_b3[0][0:1, 0:1]
            probs = jax.nn.sigmoid(z)
            dz = 2.0 * (probs - 0.5) / (2.0 * B)
            lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
            row8 = jax.lax.broadcasted_iota(jnp.int32, (8, 256), 0)
            dWd3 = jnp.where(row8 == 0, jnp.sum(h2 * dz, axis=0, keepdims=True), 0.0)
            dbd3 = jnp.where(lane1 == 0, jnp.sum(dz), 0.0)
            dh2 = dz * w3row
            dp2 = dh2 * jnp.where(p2 >= 0, 1.0, 0.2)
            dWd2 = jax.lax.dot_general(h1, dp2, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            dbd2 = jnp.sum(dp2, axis=0, keepdims=True)
            dh1 = jax.lax.dot_general(dp2, d_w2[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            dp1 = dh1 * jnp.where(p1 >= 0, 1.0, 0.2)
            dWd1 = jax.lax.dot_general(x0, dp1, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            dbd1 = jnp.sum(dp1, axis=0, keepdims=True)
            if VARIANT != "noadam":
                adam_apply([d_w1, d_b1, d_w2, d_b2, d_w3, d_b3],
                           [dWd1, dbd1, dWd2, dbd2, dWd3, dbd3], lr_d, inv1_d, inv2_d)
            else:
                for pref, gr in zip([d_w1, d_b1, d_w2, d_b2, d_w3, d_b3],
                                    [dWd1, dbd1, dWd2, dbd2, dWd3, dbd3]):
                    pref[0] = pref[0] - lr_d * gr
            acc = acc + jnp.sum(dz) + jnp.sum(pn[:, 0:1]) * 0.0

        if VARIANT in ("nogbwd", "noadam"):
            # F fwd (frozen surrogate) --------------------------------
            a = pn
            for li in range(5):
                fw, fb, fg, fbe = frozen[4*li:4*li+4]
                if li == 0:
                    t = fb[0:1, :] + sum(a[:, k:k+1] * fw[k:k+1, :] for k in range(4))
                else:
                    t = mm(a, fw[:, :]) + fb[0:1, :]
                mu = jnp.mean(t, axis=-1, keepdims=True)
                var = jnp.maximum(0.0, jnp.mean(t*t, axis=-1, keepdims=True) - mu*mu)
                ln = (t - mu) * jax.lax.rsqrt(var + 1e-6) * fg[0:1, :] + fbe[0:1, :]
                a = jnp.where(ln >= 0, ln, 0.2 * ln)
            fw6s, fb6s = frozen[20], frozen[21]
            recon = mm(a, fw6s[:]) + fb6s[0:1, :]
            acc = acc + jnp.sum(recon) * 1e-20

        mlane1 = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
        mrow = jnp.where(mlane1 == 0, 1.0 + acc, 0.0) / steps_per_epoch

        @pl.when(i % rs == 0)
        def _():
            metrics_ref[0] = mrow

        @pl.when(i % rs != 0)
        def _():
            metrics_ref[0] = metrics_ref[0] + mrow

    return kernel

MK._make_kernel = stripped_make_kernel

cfg = default_config()
ds = synthetic_dataset(cfg.data)
g, d, f = build_trio(cfg)
spe = ds.num_samples // cfg.train.batch_size
g_tx, d_tx, f_tx = make_optimizers(cfg, spe)
fs = init_forward_state(f, f_tx, jax.random.PRNGKey(0))
state = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(1),
                         forward_variables=fs.f.variables)
settings = StepSettings.from_config(cfg)
multi_epoch = MK.make_pallas_multi_epoch_fn(cfg, settings)
chunk = 100
ones = jnp.ones((chunk,), jnp.float32)
for w in range(2):
    state, m = multi_epoch(state, ds, jax.random.PRNGKey(2 + w), ones)
jax.device_get(m["d_loss"])
rates = []
for e in range(4):
    t0 = time.perf_counter()
    for c in range(20):
        state, m = multi_epoch(state, ds, jax.random.PRNGKey(10 + e*20 + c), ones)
    jax.device_get(m["d_loss"])
    rates.append(20 * chunk * spe / (time.perf_counter() - t0))
rates.sort()
print(json.dumps({"variant": VARIANT, "best": round(rates[-1], 1),
                  "median": round(rates[2], 1),
                  "us_per_step": round(1e6 / rates[-1], 2)}))
