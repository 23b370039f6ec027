"""Regression tests for the code-review findings (round-1 review pass)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu import default_config
from pigan_thz_tpu.cli import main
from pigan_thz_tpu.config import DataConfig
from pigan_thz_tpu.data import load_csv, save_csv, synthetic_dataset
from pigan_thz_tpu.design import ScreeningConfig, screen_designs
from pigan_thz_tpu.models import build_forward_model
from pigan_thz_tpu.config import ForwardModelConfig
from pigan_thz_tpu.ops.pallas_kernels import extract_forward_mlp_weights
from pigan_thz_tpu.parallel import make_mesh
from pigan_thz_tpu.train import Trainer, checkpoint as ckpt

pytestmark = pytest.mark.slow  # end-to-end training tier


def test_cli_forward_only_saves_artifact(tmp_path):
    """forward_only used to crash in save_final (no pigan_state)."""
    workdir = str(tmp_path / "runs")
    rc = main([
        "train", "--mode", "forward_only", "--epochs", "2",
        "--workdir", workdir, "--set", "data.num_samples=96",
        "--set", "train.batch_size=32",
    ])
    assert rc == 0
    assert ckpt.exists(os.path.join(workdir, "saved_models"),
                       ckpt.FORWARD_MODEL_PRETRAINED)


def test_trainer_adapts_to_csv_spectrum_dim(tmp_path):
    """A CSV with a non-250 Freq_* column count must train, not crash."""
    cfg300 = DataConfig(num_samples=64, spectrum_dim=300)
    ds300 = synthetic_dataset(cfg300)
    path = str(tmp_path / "wide.csv")
    save_csv(ds300, path)
    t = Trainer(default_config().replace(data=DataConfig(num_samples=64)),
                csv_path=path, epochs_per_call=2)
    assert t.cfg.data.spectrum_dim == 300
    t.pretrain_forward(epochs=2, log_every=100)
    assert np.isfinite(t.train_history["forward/loss"][-1])


def test_csv_frequencies_from_header(tmp_path, small_ds, cfg):
    """Loaded frequencies must come from the Freq_* header values."""
    path = str(tmp_path / "f.csv")
    save_csv(small_ds, path)
    ds2 = load_csv(path, cfg.data)
    # header freqs were written at 2-decimal precision
    np.testing.assert_allclose(
        np.asarray(ds2.frequencies),
        np.round(np.asarray(small_ds.frequencies), 2),
        atol=1e-6,
    )


def test_checkpoint_interval_crossing(tmp_path, cfg, small_ds):
    """maybe_save must fire when an interval boundary is CROSSED even if the
    epoch numbers never land on an exact multiple."""
    mgr = ckpt.CheckpointManager(str(tmp_path / "ck"), save_interval=30)
    t = Trainer(cfg, ds=small_ds, epochs_per_call=25)
    t.init_pigan()
    t.train_pigan(epochs=75, log_every=10**9, checkpoint_manager=mgr)
    assert mgr.latest_epoch() is not None  # 50 crosses 30, 75 crosses 60
    mgr.close()


def test_nan_guard_catches_inf(cfg, small_ds):
    t = Trainer(cfg, ds=small_ds)
    with pytest.raises(FloatingPointError):
        t._record({"loss": jnp.inf}, "x/", 0)


def test_pallas_rejects_enhanced_models():
    f = build_forward_model(ForwardModelConfig(name="branched"))
    k = jax.random.PRNGKey(0)
    fv = f.init({"params": k, "dropout": k}, jnp.zeros((2, 4)), train=False)
    with pytest.raises(ValueError, match="baseline ForwardMLP only"):
        extract_forward_mlp_weights(fv)


def test_screening_mesh_and_pallas_exclusive(small_ds):
    f = build_forward_model(ForwardModelConfig())
    k = jax.random.PRNGKey(0)
    fv = f.init({"params": k, "dropout": k}, jnp.zeros((2, 4)), train=False)
    mesh = make_mesh()
    with pytest.raises(ValueError, match="mutually exclusive"):
        screen_designs(
            f, fv, small_ds.frequencies, small_ds.param_lo, small_ds.param_hi,
            jax.random.PRNGKey(1),
            ScreeningConfig(num_candidates=1024, chunk_size=512, use_pallas=True),
            mesh=mesh,
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_screening_mesh_sharded(small_ds):
    f = build_forward_model(ForwardModelConfig())
    k = jax.random.PRNGKey(0)
    fv = f.init({"params": k, "dropout": k}, jnp.zeros((2, 4)), train=False)
    mesh = make_mesh()
    res = screen_designs(
        f, fv, small_ds.frequencies, small_ds.param_lo, small_ds.param_hi,
        jax.random.PRNGKey(1),
        ScreeningConfig(num_candidates=4096, chunk_size=1024, top_k=8),
        mesh=mesh,
    )
    scores = np.asarray(res.scores)
    assert all(scores[i] >= scores[i + 1] for i in range(len(scores) - 1))


def test_epoch_fn_cache_reused(cfg, small_ds):
    from pigan_thz_tpu.train.steps import StepSettings

    t = Trainer(cfg, ds=small_ds, epochs_per_call=2)
    t.init_pigan()
    s = StepSettings()
    t.train_pigan(epochs=2, log_every=10**9, settings=s)
    assert len(t._epoch_fns) == 1
    t.train_pigan(epochs=2, log_every=10**9, settings=s)
    assert len(t._epoch_fns) == 1  # same settings -> cache hit
    t.train_pigan(epochs=2, log_every=10**9,
                  settings=StepSettings(adv_w=2.0))
    assert len(t._epoch_fns) == 2
