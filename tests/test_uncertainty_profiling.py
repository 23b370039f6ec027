"""MC-dropout uncertainty + profiling utility tests."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from pigan_thz_tpu.config import ForwardModelConfig
from pigan_thz_tpu.models import (
    UncertaintyForwardModel,
    build_forward_model,
    mc_dropout_predict,
    sample_predictions,
)
from pigan_thz_tpu.utils import StepTimer

pytestmark = pytest.mark.slow  # end-to-end training tier


def test_mc_dropout_uncertainty_nonzero():
    f = build_forward_model(ForwardModelConfig())
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (4, 4), minval=-1, maxval=1)
    fv = f.init({"params": k, "dropout": k}, x, train=False)
    s_mean, s_std, m_mean, m_std = mc_dropout_predict(f, fv, x, k, num_samples=16)
    assert s_mean.shape == (4, 250) and s_std.shape == (4, 250)
    assert float(jnp.mean(s_std)) > 0.0      # dropout induces spread
    assert float(jnp.mean(m_std)) > 0.0
    # deterministic eval should be within a few std of the MC mean on average
    det_s, _ = f.apply(fv, x, train=False)
    assert float(jnp.mean(jnp.abs(det_s - s_mean))) < 5 * float(jnp.mean(s_std)) + 1.0


def test_uncertainty_model_sampling():
    m = UncertaintyForwardModel()
    k = jax.random.PRNGKey(0)
    x = jax.random.uniform(k, (3, 4), minval=-1, maxval=1)
    v = m.init({"params": k, "dropout": k}, x, train=False)
    specs, mets = sample_predictions(m, v, x, k, num_samples=8)
    assert specs.shape == (8, 3, 250)
    assert mets.shape == (8, 3, 8)
    assert float(jnp.std(specs, axis=0).mean()) > 0.0


def test_step_timer():
    t = StepTimer(warmup=2)
    import time

    for _ in range(6):
        time.sleep(0.01)
        t.tick()
    sps = t.steps_per_sec()
    assert 20 < sps < 200          # ~100/s nominal, generous bounds
    assert t.mean_step_ms() > 0


def test_step_timer_warmup_zero_and_one():
    """warmup=0 must anchor on the first tick (review r4: it previously
    never anchored and returned NaN forever)."""
    import math

    from pigan_thz_tpu.utils.profiling import StepTimer

    for w in (0, 1):
        t = StepTimer(warmup=w)
        for _ in range(5):
            t.tick()
        assert not math.isnan(t.steps_per_sec()), w
        assert t.steps_per_sec() > 0
