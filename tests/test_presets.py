"""Optimization-config overlay tests (training_optimization.py parity)."""

from pigan_thz_tpu import default_config
from pigan_thz_tpu.config_presets import (
    apply_optimization_config,
    get_optimization_config,
    step_settings_from_optimization,
)


def test_overlay_structure():
    opt = get_optimization_config()
    # the ten sections of training_optimization.get_optimization_config
    assert set(opt) == {
        "forward_model", "generator", "discriminator", "constraints",
        "training", "loss_weights", "model_architecture", "optimizer",
        "evaluation_targets", "monitoring",
    }
    # recorded values preserved
    assert opt["constraints"]["parameter_ranges"]["r1"] == (2.2, 2.8)
    assert opt["evaluation_targets"]["pigan"]["parameter_r2_target"] == 0.85
    assert opt["loss_weights"]["reconstruction_loss"] == 10.0
    assert opt["monitoring"]["wandb_logging"] is False


def test_apply_to_typed_config():
    cfg = apply_optimization_config(default_config())
    assert cfg.train.lr_d == 1e-4          # discriminator lr from overlay
    assert cfg.generator.name == "residual"
    assert cfg.discriminator.use_spectral_norm is True
    assert cfg.loss.recon == 10.0
    assert cfg.train.label_smooth_real == 0.9
    assert cfg.train.detach_forward is False


def test_step_settings_translation():
    st = step_settings_from_optimization()
    assert st.recon_w == 10.0
    assert st.constraint_w == 3.0
    assert st.stability_w == 1.0
    assert st.detach_forward is False


def test_optimized_config_builds_models():
    from pigan_thz_tpu.models import build_trio

    cfg = apply_optimization_config(default_config())
    g, d, f = build_trio(cfg)
    assert g is not None and d is not None and f is not None


def test_cli_preset_flag_layering():
    """--preset optimized applies the overlay BEFORE --set, so explicit
    overrides still win; other commands without the flag are unaffected."""
    from types import SimpleNamespace

    from pigan_thz_tpu.cli import _make_cfg

    args = SimpleNamespace(config=None, preset="optimized", seed=None,
                           set=["train.lr_g=9e-5"], workdir="/tmp/w")
    cfg = _make_cfg(args)
    assert cfg.generator.name == "residual"
    assert cfg.discriminator.name == "dual_encoder"
    assert cfg.train.detach_forward is False
    assert cfg.train.lr_g == 9e-5          # --set wins over the overlay
    # absent attribute (evaluate/export arg namespaces): no preset applied
    args2 = SimpleNamespace(config=None, seed=None, set=[], workdir="/tmp/w")
    assert _make_cfg(args2).generator.name == "mlp"


def test_optimized_settings_cfg_routed():
    """step_settings_from_optimized_config(cfg) == the static overlay
    builder on the untouched overlay, and --set overrides reach the fused
    step's settings (the static builder silently ignored them)."""
    from pigan_thz_tpu.config import apply_overrides
    from pigan_thz_tpu.config_presets import step_settings_from_optimized_config

    cfg = apply_optimization_config(default_config())
    assert step_settings_from_optimized_config(cfg) == \
        step_settings_from_optimization()
    tweaked = apply_overrides(cfg, ["loss.recon=50", "loss.stability=0"])
    st = step_settings_from_optimized_config(tweaked)
    assert st.recon_w == 50.0 and st.stability_w == 0.0


def test_scaled_batch_preset():
    """`--preset scaled` overlay (round 5): the measured large-batch
    recipe — batch 512, lr x2, through-F gradients; --set still wins."""
    from pigan_thz_tpu import default_config
    from pigan_thz_tpu.config import apply_overrides
    from pigan_thz_tpu.config_presets import (
        SCALED_BATCH_SCHEDULE,
        apply_scaled_batch_config,
    )
    from pigan_thz_tpu.train.schedules import make_schedule
    from pigan_thz_tpu.train.steps import StepSettings

    cfg = apply_scaled_batch_config(default_config())
    assert cfg.train.batch_size == 512
    assert abs(cfg.train.lr_g - 4e-4) < 1e-12
    assert abs(cfg.train.lr_d - 4e-4) < 1e-12
    assert cfg.train.detach_forward is False
    # the recipe's settings inherit through from_config
    assert StepSettings.from_config(cfg).detach_forward is False
    # user overrides applied after the overlay win (CLI order)
    cfg2 = apply_overrides(cfg, ["train.batch_size=256"])
    assert cfg2.train.batch_size == 256
    # the schedule name resolves in the shared dispatch (both backends)
    make_schedule(SCALED_BATCH_SCHEDULE, cfg.train.lr_g, 10, 2)
