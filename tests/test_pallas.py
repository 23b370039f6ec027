"""Pallas fused-MLP kernel tests (interpret mode on CPU; compiled path is
exercised on real TPU by bench/screening runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu.config import ForwardModelConfig
from pigan_thz_tpu.models import build_forward_model
from pigan_thz_tpu.ops.pallas_kernels import (
    extract_forward_mlp_weights,
    forward_surrogate_fused,
    fused_mlp_forward,
)


@pytest.fixture(scope="module")
def model_and_vars():
    f = build_forward_model(ForwardModelConfig())
    k = jax.random.PRNGKey(0)
    fv = f.init({"params": k, "dropout": k}, jnp.zeros((2, 4)), train=False)
    return f, fv


def test_weight_extraction_shapes(model_and_vars):
    _, fv = model_and_vars
    layers, head = extract_forward_mlp_weights(fv)
    dims = [(4, 256), (256, 512), (512, 1024), (1024, 512), (512, 256)]
    for (W, b, s, bias), (i, o) in zip(layers, dims):
        assert W.shape == (i, o)
        assert b.shape == (o,) and s.shape == (o,) and bias.shape == (o,)
    assert head[0].shape == (256, 258)


def test_fused_matches_flax_interpret(model_and_vars):
    """Interpret-mode kernel must match flax apply to fp32 tolerance."""
    f, fv = model_and_vars
    x = jax.random.uniform(jax.random.PRNGKey(1), (300, 4), minval=-1, maxval=1)
    ref_s, ref_m = f.apply(fv, x, train=False)
    got_s, got_m = forward_surrogate_fused(fv, x, interpret=True)
    # CPU interpret mode runs true fp32 matmuls -> tight tolerance
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(ref_m), atol=1e-4)


def test_fused_pads_ragged_batch(model_and_vars):
    f, fv = model_and_vars
    x = jax.random.uniform(jax.random.PRNGKey(2), (77, 4), minval=-1, maxval=1)
    got_s, got_m = forward_surrogate_fused(fv, x, interpret=True, tile_b=64)
    assert got_s.shape == (77, 250)
    assert got_m.shape == (77, 8)
    ref_s, _ = f.apply(fv, x, train=False)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(ref_s), atol=1e-4)


def test_fused_generic_chain():
    """fused_mlp_forward on a hand-built 2-layer chain vs a numpy oracle."""
    rng = np.random.default_rng(0)
    W1 = rng.normal(size=(8, 16)).astype(np.float32)
    b1 = rng.normal(size=(16,)).astype(np.float32)
    s1 = rng.normal(size=(16,)).astype(np.float32)
    c1 = rng.normal(size=(16,)).astype(np.float32)
    Wh = rng.normal(size=(16, 4)).astype(np.float32)
    bh = rng.normal(size=(4,)).astype(np.float32)
    x = rng.normal(size=(10, 8)).astype(np.float32)

    h = x @ W1 + b1
    mean = h.mean(-1, keepdims=True)
    var = ((h - mean) ** 2).mean(-1, keepdims=True)
    h = (h - mean) / np.sqrt(var + 1e-5) * s1 + c1
    h = np.where(h >= 0, h, 0.2 * h)
    expected = h @ Wh + bh

    got = fused_mlp_forward(
        jnp.asarray(x),
        [(jnp.asarray(W1), jnp.asarray(b1), jnp.asarray(s1), jnp.asarray(c1))],
        (jnp.asarray(Wh), jnp.asarray(bh)),
        tile_b=8,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-4)


def test_generator_fused_bn_folding():
    """Fused generator with BatchNorm folded must match flax eval mode
    exactly, including non-trivial running stats."""
    from pigan_thz_tpu.config import GeneratorConfig
    from pigan_thz_tpu.models import build_generator
    from pigan_thz_tpu.ops.pallas_kernels import generator_fused

    g = build_generator(GeneratorConfig())
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (100, 250))
    gv = dict(g.init(k, x, train=False))
    gv["batch_stats"] = jax.tree.map(
        lambda a: a + 0.1 * jax.random.normal(k, a.shape) ** 2, gv["batch_stats"]
    )
    ref = g.apply(gv, x, train=False)
    got = generator_fused(gv, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_generator_fused_rejects_wrong_arch():
    from pigan_thz_tpu.config import GeneratorConfig
    from pigan_thz_tpu.models import build_generator
    from pigan_thz_tpu.ops.pallas_kernels import extract_generator_weights

    g = build_generator(GeneratorConfig(norm="layer"))
    k = jax.random.PRNGKey(0)
    gv = g.init(k, jnp.zeros((2, 250)), train=False)
    with pytest.raises(ValueError):
        extract_generator_weights(gv)  # no batch_stats -> not the BN model
