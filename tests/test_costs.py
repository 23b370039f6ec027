"""Analytic step-cost model (ops/costs.py) sanity + invariants."""

import dataclasses

from pigan_thz_tpu import default_config
from pigan_thz_tpu.ops.costs import (
    device_peak_flops,
    device_peak_hbm,
    pigan_step_costs,
)
from pigan_thz_tpu.train.steps import StepSettings


def _cfg_settings(**over):
    cfg = default_config()
    return cfg, dataclasses.replace(StepSettings.from_config(cfg), **over)


def test_flagship_magnitudes():
    cfg, s = _cfg_settings()
    c = pigan_step_costs(cfg, s)
    # docstring anchor: ~0.5-0.8 GFLOP/step for the baseline trio
    assert 0.3e9 < c.model_flops < 1.2e9
    assert c.padded_flops >= c.model_flops
    # stream = minibatch-only (~129 KB); resident state ~12 MB fits VMEM
    assert 64 * 1024 < c.stream_bytes < 512 * 1024
    assert 8e6 < c.state_bytes < 20e6
    # XLA path moves the whole optimizer state per step — much bigger
    assert c.xla_hbm_bytes > 10 * c.stream_bytes


def test_knobs_move_costs_monotonically():
    cfg, s = _cfg_settings()
    base = pigan_step_costs(cfg, s)
    through_f = pigan_step_costs(cfg, dataclasses.replace(s, detach_forward=False))
    assert through_f.model_flops > base.model_flops
    wgan = pigan_step_costs(
        cfg, dataclasses.replace(s, gan_loss="wgan_gp", gp_weight=10.0)
    )
    assert wgan.model_flops > base.model_flops
    assert wgan.stream_bytes > base.stream_bytes        # eps stream
    cyc = pigan_step_costs(cfg, dataclasses.replace(s, cycle_w=1.0))
    assert cyc.model_flops > base.model_flops
    stab = pigan_step_costs(cfg, dataclasses.replace(s, stability_w=0.1))
    assert stab.model_flops > base.model_flops
    assert stab.stream_bytes > base.stream_bytes        # noisy-spectrum stream
    ema = pigan_step_costs(cfg, dataclasses.replace(s, ema_decay=0.99))
    assert ema.state_bytes > base.state_bytes           # EMA buffers resident


def test_peak_tables():
    assert device_peak_flops("TPU v5 lite") == 197e12
    assert device_peak_hbm("TPU v5 lite") == 819e9
    assert device_peak_flops("Tesla V100") is None
    assert device_peak_hbm("cpu") is None


def test_compiled_analysis_agrees_with_analytic_baseline(small_ds):
    """XLA's cost analysis of the compiled fused step should land near the
    analytic model for the baseline trio (same matmul inventory).  XLA
    counts every HLO op (elementwise, reductions, the optimizer update)
    and may simplify others, so agree-within-2x is the contract; the
    point is catching order-of-magnitude modeling drift on either side."""
    import jax
    import jax.numpy as jnp

    from pigan_thz_tpu.data.dataset import gather_batch
    from pigan_thz_tpu.models import build_trio
    from pigan_thz_tpu.ops.costs import compiled_fn_analysis
    from pigan_thz_tpu.train import (
        init_pigan_state,
        make_optimizers,
        make_pigan_step,
    )

    cfg = default_config()
    g, d, f = build_trio(cfg)
    g_tx, d_tx, _ = make_optimizers(cfg, 15)
    state = init_pigan_state(
        g, d, f, g_tx, d_tx, jax.random.PRNGKey(0),
        spectrum_dim=cfg.data.spectrum_dim, param_dim=cfg.data.param_dim,
    )
    settings = StepSettings.from_config(cfg)
    step = make_pigan_step(g, d, f, g_tx, d_tx, settings,
                           small_ds.param_lo, small_ds.param_hi)
    n = small_ds.spectra.shape[0]
    idx = jnp.arange(cfg.train.batch_size) % n
    batch = gather_batch(small_ds, idx)
    ca = compiled_fn_analysis(step, state, batch, jnp.float32(1.0))
    assert ca["flops"] > 0
    analytic = pigan_step_costs(cfg, settings).model_flops
    ratio = ca["flops"] / analytic
    assert 0.5 < ratio < 2.0, (ca["flops"], analytic)
