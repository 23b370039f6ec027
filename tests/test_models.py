"""Model zoo tests: shapes, activation ranges, parameter counts (parity with
the reference architectures), registry dispatch, torch-free MC dropout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu import default_config
from pigan_thz_tpu.config import (
    DiscriminatorConfig,
    ForwardModelConfig,
    GeneratorConfig,
)
from pigan_thz_tpu.models import (
    build_discriminator,
    build_forward_model,
    build_generator,
    build_trio,
)
from pigan_thz_tpu.models.blocks import adaptive_avg_pool1d, adaptive_avg_pool_matrix


def _nparams(variables):
    return sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def spec(rng):
    return jax.random.normal(rng, (8, 250))


@pytest.fixture(scope="module")
def par(rng):
    return jax.random.uniform(rng, (8, 4))


def test_baseline_generator_parity(rng, spec):
    g = build_generator(GeneratorConfig())
    v = g.init(rng, spec, train=False)
    out = g.apply(v, spec, train=False)
    assert out.shape == (8, 4)
    assert float(jnp.max(jnp.abs(out))) <= 1.0  # tanh head (generator.py:25)
    # 250*512+512 + 512*256+256 + 256*4+4 + BN scales/biases (512+256)*2
    assert _nparams(v) == 262404


def test_baseline_discriminator_parity(rng, spec, par):
    d = build_discriminator(DiscriminatorConfig())
    v = d.init(rng, spec, par, train=False)
    out = d.apply(v, spec, par, train=False)
    assert out.shape == (8, 1)
    # logits: unbounded (sigmoid applied by consumers)
    expected = (254 * 512 + 512) + (512 * 256 + 256) + (256 * 1 + 1)
    assert _nparams(v) == expected


def test_baseline_forward_parity(rng, par):
    f = build_forward_model(ForwardModelConfig())
    v = f.init(rng, par, train=False)
    s, m = f.apply(v, par, train=False)
    assert s.shape == (8, 250)
    assert m.shape == (8, 8)


@pytest.mark.parametrize("name", ["mlp", "conv_attn", "residual"])
def test_generator_variants(name, rng, spec):
    g = build_generator(GeneratorConfig(name=name))
    v = g.init({"params": rng, "dropout": rng}, spec, train=False)
    out = g.apply(v, spec, train=False)
    assert out.shape == (8, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("name", ["mlp", "dual_encoder", "conv", "multi_scale"])
def test_discriminator_variants(name, rng, spec, par):
    d = build_discriminator(DiscriminatorConfig(name=name, use_spectral_norm=True))
    v = d.init({"params": rng, "dropout": rng}, spec, par, train=False)
    out = d.apply(v, spec, par, train=False)
    assert out.shape == (8, 1)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("name", ["mlp", "branched", "physics", "uncertainty"])
def test_forward_variants(name, rng, par):
    f = build_forward_model(ForwardModelConfig(name=name))
    v = f.init({"params": rng, "dropout": rng}, par, train=False)
    out = f.apply(v, par, train=False)
    if name == "uncertainty":
        s, m, sv, mv = out
        assert float(jnp.min(sv)) >= 0.0 and float(jnp.min(mv)) >= 0.0
    else:
        s, m = out
    assert s.shape == (8, 250) and m.shape[0] == 8


def test_mc_dropout_stochastic(rng, par):
    """MC-dropout: two stochastic passes differ, deterministic passes agree
    (forward_model.py:33 uncertainty mechanism)."""
    f = build_forward_model(ForwardModelConfig())
    v = f.init(rng, par, train=False)
    k1, k2 = jax.random.split(rng)
    s1, _ = f.apply(v, par, train=True, rngs={"dropout": k1})
    s2, _ = f.apply(v, par, train=True, rngs={"dropout": k2})
    assert float(jnp.max(jnp.abs(s1 - s2))) > 0.0
    d1 = f.apply(v, par, train=False)
    d2 = f.apply(v, par, train=False)
    np.testing.assert_array_equal(np.asarray(d1[0]), np.asarray(d2[0]))


def test_adaptive_pool_matches_torch_bins():
    """Bin edges must match torch AdaptiveAvgPool1d (floor/ceil)."""
    m = adaptive_avg_pool_matrix(62, 32)
    assert m.shape == (32, 62)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, rtol=1e-6)
    # first bin covers [0, ceil(62/32)=2): 2 elements
    assert m[0, 0] == pytest.approx(0.5)
    x = jnp.arange(62.0)[None, :, None]
    pooled = adaptive_avg_pool1d(x, 32)
    assert pooled.shape == (1, 32, 1)
    # identity when in_len == out_len
    same = adaptive_avg_pool1d(x, 62)
    np.testing.assert_allclose(np.asarray(same), np.asarray(x))


def test_build_trio(rng):
    cfg = default_config()
    g, d, f = build_trio(cfg)
    assert g is not None and d is not None and f is not None


def test_batchnorm_updates_stats(rng, spec):
    g = build_generator(GeneratorConfig(norm="batch"))
    v = g.init(rng, spec, train=False)
    out, updated = g.apply(v, spec, train=True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(v["batch_stats"])
    after = jax.tree_util.tree_leaves(updated["batch_stats"])
    assert any(
        float(jnp.max(jnp.abs(a - b))) > 0 for a, b in zip(after, before)
    )
