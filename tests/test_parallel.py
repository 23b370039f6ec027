"""Mesh / sharding tests on the virtual 8-device CPU platform (conftest sets
xla_force_host_platform_device_count=8 — the fake-backend equivalent)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pigan_thz_tpu.models import build_trio
from pigan_thz_tpu.parallel import (
    MODEL_AXIS,
    make_mesh,
    make_parallel_epoch_fn,
    param_partition_spec,
    replicate_dataset,
    shard_state,
)
from pigan_thz_tpu.train import (
    StepSettings,
    init_pigan_state,
    make_optimizers,
    make_pigan_step,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh = make_mesh(model=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2
    with pytest.raises(ValueError):
        make_mesh(data=3, model=2)


def test_param_partition_rule():
    x = jnp.zeros((512, 1024))
    assert param_partition_spec(None, x, 2, 512) == P(None, MODEL_AXIS)
    small = jnp.zeros((4, 16))
    assert param_partition_spec(None, small, 2, 512) == P()
    bias = jnp.zeros((1024,))
    assert param_partition_spec(None, bias, 2, 512) == P(MODEL_AXIS)
    odd = jnp.zeros((513, 7))
    assert param_partition_spec(None, odd, 2, 512) == P()


@pytest.mark.slow
def test_parallel_epoch_matches_shapes_and_runs(cfg, small_ds):
    g, d, f = build_trio(cfg)
    g_tx, d_tx, _ = make_optimizers(cfg, 4)
    mesh = make_mesh(data=4, model=2)
    state = shard_state(
        init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(0)), mesh
    )
    ds = replicate_dataset(small_ds, mesh)
    step = make_pigan_step(
        g, d, f, g_tx, d_tx,
        StepSettings.from_config(cfg, detach_forward=False),
        small_ds.param_lo, small_ds.param_hi,
    )
    epoch = make_parallel_epoch_fn(step, cfg.train.batch_size, mesh, with_scale=True)
    state, m = epoch(state, ds, jax.random.PRNGKey(1), 1.0)
    jax.block_until_ready(m)
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    # TP sharding survives the update
    wide = [
        x for x in jax.tree_util.tree_leaves(state.f.params)
        if hasattr(x, "sharding") and x.ndim == 2 and max(x.shape) >= 512
    ]
    assert any(MODEL_AXIS in str(x.sharding.spec) for x in wide)


def test_dp_only_mesh_epoch(cfg, small_ds):
    g, d, f = build_trio(cfg)
    g_tx, d_tx, _ = make_optimizers(cfg, 4)
    mesh = make_mesh()  # 8-way pure data parallel
    state = shard_state(
        init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(0)), mesh
    )
    ds = replicate_dataset(small_ds, mesh)
    step = make_pigan_step(
        g, d, f, g_tx, d_tx, StepSettings.from_config(cfg),
        small_ds.param_lo, small_ds.param_hi,
    )
    epoch = make_parallel_epoch_fn(step, cfg.train.batch_size, mesh, with_scale=True)
    state, m = epoch(state, ds, jax.random.PRNGKey(1), 1.0)
    assert np.isfinite(float(m["g_loss"]))


@pytest.mark.slow
def test_graft_entry_contract():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py"),
    )
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out[0].shape == (8, 4)
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_mesh_trainer_end_to_end(cfg, small_ds):
    """Trainer(mesh=...) must run dp+tp SPMD through pretrain + GAN."""
    from pigan_thz_tpu.train import Trainer

    mesh = make_mesh(data=4, model=2)
    t = Trainer(cfg, ds=small_ds, epochs_per_call=2, mesh=mesh)
    t.pretrain_forward(epochs=2, log_every=100)
    t.init_pigan()
    t.train_pigan(epochs=2, log_every=100)
    assert np.isfinite(t.train_history["pigan/g_loss"][-1])
    wide = t.pigan_state.f.params["MLPBlock_2"]["Dense_0"]["kernel"]
    assert MODEL_AXIS in str(wide.sharding.spec)


def test_replica_group_parser():
    from pigan_thz_tpu.parallel.hlo_check import parse_replica_groups

    assert parse_replica_groups("{{0,1},{2,3}}") == [(0, 1), (2, 3)]
    assert parse_replica_groups("[4,2]<=[8]") == [
        (0, 1), (2, 3), (4, 5), (6, 7)
    ]
    assert parse_replica_groups("[2,4]<=[4,2]T(1,0)") == [
        (0, 2, 4, 6), (1, 3, 5, 7)
    ]
    assert parse_replica_groups("bogus") is None
    # the all-devices shorthand XLA prints for whole-world collectives
    assert parse_replica_groups("{}") == [()]


def test_empty_replica_groups_count_as_world_group():
    """replica_groups={} (one group of all devices) must satisfy the
    data-axis contract on a data-only mesh — the parser skipping it would
    make check_mesh_collectives cry replication on a correct program."""
    from pigan_thz_tpu.parallel.hlo_check import check_mesh_collectives

    mesh = make_mesh(data=8, model=1)
    text = 'x = f32[4] all-reduce(y), replica_groups={}, to_apply=add\n'
    report = check_mesh_collectives(text, mesh)
    assert report["data"] is True


@pytest.mark.slow
def test_compiled_step_contains_mesh_collectives(cfg, small_ds):
    """VERDICT r3 #3a: the compiled SPMD step must contain the gradient
    all-reduce over the data axis AND the TP matmul all-reduces over the
    model axis — catching a silent fall-back to replicated compute."""
    from pigan_thz_tpu.parallel import assert_mesh_collectives
    from pigan_thz_tpu.parallel.hlo_check import check_mesh_collectives

    g, d, f = build_trio(cfg)
    g_tx, d_tx, _ = make_optimizers(cfg, 4)
    mesh = make_mesh(data=4, model=2)
    state = shard_state(
        init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(0)), mesh
    )
    ds = replicate_dataset(small_ds, mesh)
    step = make_pigan_step(
        g, d, f, g_tx, d_tx,
        StepSettings.from_config(cfg, detach_forward=False),
        small_ds.param_lo, small_ds.param_hi,
    )
    epoch = make_parallel_epoch_fn(
        step, cfg.train.batch_size, mesh, with_scale=True
    )
    txt = epoch.lower(state, ds, jax.random.PRNGKey(1), 1.0).compile().as_text()
    assert_mesh_collectives(txt, mesh)   # raises on silent replication
    report = check_mesh_collectives(txt, mesh)
    assert report["data"] and report["model"]
    # a doctored text with no collectives must FAIL the check
    stripped = "\n".join(
        line for line in txt.splitlines() if "replica_groups" not in line
    )
    with pytest.raises(AssertionError, match="replicated compute"):
        assert_mesh_collectives(stripped, mesh)
