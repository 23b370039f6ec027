"""Int8 quantized serving path (ops/quantized.py + serve compute_dtype="int8").

Pins the post-training-quantization error envelope against the fp32 chain
and the export round-trip.  The int8 path is a serving/screening fast path
(v5e int8 MXU); tolerances here are the documented accuracy contract.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.ops.quantized import (
    make_int8_cycle_fn,
    qdense,
    quantize_weight,
)
from pigan_thz_tpu.serve import (
    export_inverse_design,
    load_exported,
    make_inverse_design_fn,
)


@pytest.fixture(scope="module")
def models(cfg, small_ds):
    g, d, f = build_trio(cfg)
    k = jax.random.PRNGKey(0)
    gv = g.init(k, small_ds.spectra[:2], train=False)
    fv = f.init({"params": k, "dropout": k}, small_ds.params_norm[:2], train=False)
    return g, f, gv, fv


def test_weight_quantization_roundtrip():
    W = jax.random.normal(jax.random.PRNGKey(1), (64, 32)) * jnp.linspace(
        0.1, 3.0, 32
    )[None, :]
    w_q, sw = quantize_weight(W)
    assert w_q.dtype == jnp.int8
    # symmetric per-channel: dequant error bounded by half a quantum per column
    err = np.abs(np.asarray(w_q, np.float32) * np.asarray(sw)[None, :] - np.asarray(W))
    assert (err <= 0.5 * np.asarray(sw)[None, :] + 1e-7).all()


def test_qdense_matches_fp32_within_quantization_error():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(k1, (16, 48))
    W = jax.random.normal(k2, (48, 24)) * 0.2
    b = jax.random.normal(k3, (24,))
    w_q, sw = quantize_weight(W)
    got = qdense(x, w_q, sw, b)
    want = x @ W + b[None, :]
    # int8 weights + int8 activations: ~1% relative on well-scaled inputs
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want),
        atol=0.05 * float(jnp.max(jnp.abs(want))),
    )


def test_int8_cycle_error_envelope(models, small_ds):
    g, f, gv, fv = models
    cyc = jax.jit(make_int8_cycle_fn(gv, fv, small_ds.spectrum_dim))
    x = small_ds.spectra[:64]
    pn8, spec8, met8 = cyc(x)
    pn32 = g.apply(gv, x, train=False)
    spec32, met32 = f.apply(fv, pn32, train=False)
    assert pn8.dtype == jnp.float32
    # documented accuracy contract (RESULTS.md "Int8 serving")
    assert float(jnp.max(jnp.abs(pn8 - pn32))) < 0.05          # tanh outputs
    for got, want in ((spec8, spec32), (met8, met32)):
        scale = float(jnp.max(jnp.abs(want))) + 1e-6
        assert float(jnp.max(jnp.abs(got - want))) / scale < 0.10


def test_serve_int8_dtype_ladder(models, small_ds):
    g, f, gv, fv = models
    fn8 = make_inverse_design_fn(g, f, gv, fv, small_ds, compute_dtype="int8")
    fn32 = make_inverse_design_fn(g, f, gv, fv, small_ds)
    p8, s8, m8 = fn8(small_ds.spectra[:32])
    p32, s32, m32 = fn32(small_ds.spectra[:32])
    span = float(jnp.max(small_ds.param_hi - small_ds.param_lo))
    assert float(jnp.max(jnp.abs(p8 - p32))) < 0.05 * span
    assert p8.shape == p32.shape and s8.shape == s32.shape


def test_int8_export_roundtrip(models, small_ds, tmp_path):
    g, f, gv, fv = models
    path = str(tmp_path / "designer_int8.stablehlo")
    export_inverse_design(
        g, f, gv, fv, small_ds, path, batch_size=8, compute_dtype="int8"
    )
    fn = load_exported(path)
    params, spec, met = fn(small_ds.spectra[:8])
    want = make_inverse_design_fn(g, f, gv, fv, small_ds, compute_dtype="int8")(
        small_ds.spectra[:8]
    )
    np.testing.assert_allclose(np.asarray(params), np.asarray(want[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(spec), np.asarray(want[1]), atol=1e-5)
    assert met.shape == (8, 8)


def test_int8_surrogate_export_roundtrip(models, small_ds, tmp_path):
    from pigan_thz_tpu.ops.quantized import int8_forward_apply, quantize_forward
    from pigan_thz_tpu.serve import export_forward_surrogate

    g, f, gv, fv = models
    path = str(tmp_path / "surrogate_int8.stablehlo")
    export_forward_surrogate(
        f, fv, small_ds, path, batch_size=8, compute_dtype="int8"
    )
    fn = load_exported(path)
    spec, met = fn(small_ds.params_norm[:8])
    want_spec, want_met = int8_forward_apply(
        quantize_forward(fv), small_ds.params_norm[:8], small_ds.spectrum_dim
    )
    np.testing.assert_allclose(np.asarray(spec), np.asarray(want_spec), atol=1e-5)
    np.testing.assert_allclose(np.asarray(met), np.asarray(want_met), atol=1e-5)
    with pytest.raises(ValueError, match="mutually exclusive"):
        export_forward_surrogate(
            f, fv, small_ds, path, batch_size=8, use_pallas=True,
            compute_dtype="int8",
        )


def test_int8_rejects_enhanced_models(cfg, small_ds):
    import dataclasses

    from pigan_thz_tpu.models import build_forward_model

    f = build_forward_model(
        dataclasses.replace(cfg.forward_model, name="branched"),
        spectrum_dim=cfg.data.spectrum_dim, metrics_dim=cfg.data.metrics_dim,
    )
    k = jax.random.PRNGKey(0)
    fv = f.init({"params": k, "dropout": k}, small_ds.params_norm[:2], train=False)
    from pigan_thz_tpu.ops.quantized import quantize_forward

    with pytest.raises(ValueError, match="baseline ForwardMLP"):
        quantize_forward(fv)
