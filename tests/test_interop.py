"""Torch-checkpoint interop round trips.

Builds the reference's baseline trio in torch (layer-for-layer:
generator.py:17-26, discriminator.py:21-28, forward_model.py:28-60 under
/root/reference/core/models/), loads random torch weights into the flax
models via interop.py, and checks OUTPUT equivalence — the strongest proof
that a reference-trained .pth evaluates identically here.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from pigan_thz_tpu import interop  # noqa: E402
from pigan_thz_tpu.models import build_trio  # noqa: E402


def _torch_generator():
    return tnn.Sequential(
        tnn.Linear(250, 512), tnn.BatchNorm1d(512), tnn.ReLU(True),
        tnn.Linear(512, 256), tnn.BatchNorm1d(256), tnn.ReLU(True),
        tnn.Linear(256, 4), tnn.Tanh(),
    )


def _torch_discriminator():
    return tnn.Sequential(
        tnn.Linear(254, 512), tnn.LeakyReLU(0.2, inplace=True),
        tnn.Linear(512, 256), tnn.LeakyReLU(0.2, inplace=True),
        tnn.Linear(256, 1), tnn.Sigmoid(),
    )


def _torch_forward_model():
    layers = []
    dims = [4, 256, 512, 1024, 512, 256]
    for i in range(5):
        layers += [
            tnn.Linear(dims[i], dims[i + 1]), tnn.LayerNorm(dims[i + 1]),
            tnn.LeakyReLU(0.2, inplace=True), tnn.Dropout(0.2),
        ]
    layers.append(tnn.Linear(256, 258))
    return tnn.Sequential(*layers)


def _randomize_bn_stats(module, seed):
    g = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, tnn.BatchNorm1d):
            m.running_mean.copy_(0.3 * torch.randn(m.num_features, generator=g))
            m.running_var.copy_(0.5 + torch.rand(m.num_features, generator=g))


@pytest.fixture(scope="module")
def torch_trio():
    torch.manual_seed(0)
    g, d, f = _torch_generator(), _torch_discriminator(), _torch_forward_model()
    _randomize_bn_stats(g, 1)
    g.eval(), d.eval(), f.eval()
    return g, d, f


@pytest.fixture(scope="module")
def flax_trio(cfg):
    return build_trio(cfg)


def test_generator_output_equivalence(torch_trio, flax_trio):
    tg, flax_g = torch_trio[0], flax_trio[0]
    # prefix: torch Sequential attribute is 'main' in the reference class;
    # a bare Sequential state_dict has no prefix -> add it
    sd = {f"main.{k}": v for k, v in tg.state_dict().items()}
    variables = interop.generator_from_torch(sd)

    x = np.random.RandomState(0).randn(16, 250).astype(np.float32)
    with torch.no_grad():
        want = tg(torch.from_numpy(x)).numpy()
    got = np.asarray(flax_g.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_discriminator_output_equivalence(torch_trio, flax_trio):
    td, flax_d = torch_trio[1], flax_trio[1]
    sd = {f"main.{k}": v for k, v in td.state_dict().items()}
    variables = interop.discriminator_from_torch(sd)

    rs = np.random.RandomState(1)
    spec = rs.randn(16, 250).astype(np.float32)
    par = rs.randn(16, 4).astype(np.float32)
    with torch.no_grad():
        want = td(torch.from_numpy(np.concatenate([spec, par], 1))).numpy()
    logits = flax_d.apply(
        variables, jnp.asarray(spec), jnp.asarray(par), train=False
    )
    got = np.asarray(jax.nn.sigmoid(logits))  # flax D returns logits
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_forward_model_output_equivalence(torch_trio, flax_trio):
    tf, flax_f = torch_trio[2], flax_trio[2]
    sd = {f"model.{k}": v for k, v in tf.state_dict().items()}
    variables = interop.forward_model_from_torch(sd)

    x = np.random.RandomState(2).randn(16, 4).astype(np.float32)
    with torch.no_grad():
        out = tf(torch.from_numpy(x)).numpy()
    spec, met = flax_f.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(spec), out[:, :250], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(met), out[:, 250:], rtol=1e-4, atol=1e-4)


def test_flax_to_torch_round_trip(torch_trio):
    """torch -> flax -> torch reproduces every tensor exactly."""
    tg = torch_trio[0]
    sd = {f"main.{k}": v for k, v in tg.state_dict().items()}
    variables = interop.generator_from_torch(sd)
    back = interop.flax_to_torch(variables, interop.GENERATOR_MAP)
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        np.testing.assert_array_equal(back[k], v.numpy(), err_msg=k)


@pytest.mark.slow
def test_load_reference_models_dir(torch_trio, flax_trio, cfg, tmp_path):
    """The unified_evaluator saved_models contract: *_final.pth trio on disk
    loads into a Trainer and evaluates."""
    tg, td, tf = torch_trio
    torch.save({f"main.{k}": v for k, v in tg.state_dict().items()},
               tmp_path / "generator_final.pth")
    torch.save({f"main.{k}": v for k, v in td.state_dict().items()},
               tmp_path / "discriminator_final.pth")
    # forward model via the wrapped-checkpoint format + pretrained name
    torch.save(
        {"epoch": 3,
         "forward_model_state_dict":
             {f"model.{k}": v for k, v in tf.state_dict().items()}},
        tmp_path / "forward_model_pretrained.pth",
    )

    assert interop.has_torch_artifacts(str(tmp_path))
    from pigan_thz_tpu.train import Trainer

    trainer = Trainer(cfg)
    trainer.load_final(str(tmp_path))
    res = trainer.evaluate()
    assert np.isfinite(res["pigan_evaluation"]["parameter_prediction"]["r2"])


def test_wrong_architecture_rejected(torch_trio, flax_trio):
    tg = torch_trio[0]
    sd = {f"main.{k}": v for k, v in tg.state_dict().items()}
    variables = interop.generator_from_torch(sd)
    bad_template = jax.tree.map(lambda x: x[..., :1], variables)
    with pytest.raises(ValueError, match="does not match"):
        interop.validate_shapes(variables, bad_template, "generator")


def test_extract_state_dict_rejects_metadata_only():
    """Metadata-only wrappers and empty dicts must raise the readable
    no-state-dict error, not masquerade as bare state_dicts (and then die
    later with an opaque missing-weight KeyError)."""
    with pytest.raises(KeyError, match="no state_dict"):
        interop.extract_state_dict({}, "generator")
    with pytest.raises(KeyError, match="no state_dict"):
        interop.extract_state_dict({"epoch": 5, "version": "1.0"}, "generator")


@pytest.mark.slow
def test_stray_pth_does_not_shadow_native_trio(cfg, small_ds, tmp_path):
    """A lone reference .pth sitting next to a COMPLETE Orbax trio must not
    reroute load_final onto the (incomplete) torch path."""
    from pigan_thz_tpu.train import Trainer

    t = Trainer(cfg, ds=small_ds)
    t.init_pigan()
    t.save_final(str(tmp_path))
    # stray torch artifact (contents never read — presence alone used to
    # trigger the torch branch and a FileNotFoundError)
    torch.save({"epoch": 1}, tmp_path / "forward_model_pretrained.pth")

    t2 = Trainer(cfg, ds=small_ds)
    t2.load_final(str(tmp_path))  # must succeed via the native trio
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        t2.pigan_state.g.params, t.pigan_state.g.params,
    )
