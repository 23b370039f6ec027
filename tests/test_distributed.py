"""Multi-process jax.distributed bring-up (VERDICT.md round-1 item 8).

Spawns TWO real processes that rendezvous through
``initialize_distributed`` (parallel/mesh.py), build the shared (data,
model) mesh over the global device set, and run a cross-process global
reduction (Gloo collectives on the CPU backend) — the same code path a
multi-host TPU pod uses over DCN.
"""

import os
import re
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port = int(sys.argv[1]), sys.argv[2]
    from pigan_thz_tpu.parallel.mesh import (
        DATA_AXIS, initialize_distributed, make_mesh,
    )
    initialize_distributed(f"127.0.0.1:{{port}}", 2, pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 2      # global view spans both processes
    assert len(jax.local_devices()) == 1

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(data=2, model=1)   # same call as single-host code
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    local = np.full((2, 4), float(pid + 1), np.float32)
    garr = jax.make_array_from_process_local_data(sharding, local, (4, 4))
    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
    )(garr)
    # rows from proc0 are 1.0, from proc1 are 2.0 -> 8 + 16
    assert float(total) == 24.0, float(total)
    print(f"proc {{pid}} ok", flush=True)
    """
).format(repo=REPO)


TRAIN_WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port = int(sys.argv[1]), sys.argv[2]
    from pigan_thz_tpu.parallel.mesh import initialize_distributed, make_mesh
    initialize_distributed(f"127.0.0.1:{{port}}", 2, pid)
    assert len(jax.devices()) == 2 and len(jax.local_devices()) == 1

    import jax.numpy as jnp
    from pigan_thz_tpu import default_config
    from pigan_thz_tpu.config import DataConfig
    from pigan_thz_tpu.data import synthetic_dataset
    from pigan_thz_tpu.models import build_trio
    from pigan_thz_tpu.parallel import (
        make_mesh, make_parallel_epoch_fn, replicate_dataset, shard_state,
    )
    from pigan_thz_tpu.train import (
        StepSettings, init_pigan_state, make_optimizers, make_pigan_step,
    )

    # identical inputs on both processes (single-controller-per-host SPMD)
    cfg = default_config().replace(data=DataConfig(num_samples=64))
    ds = synthetic_dataset(cfg.data, key=jax.random.PRNGKey(7))
    g, d, f = build_trio(cfg)
    g_tx, d_tx, _ = make_optimizers(cfg, steps_per_epoch=4)
    state = init_pigan_state(g, d, f, g_tx, d_tx, jax.random.PRNGKey(0))

    # the SAME calls a single-host run makes — the mesh just spans two
    # processes now, so the gradient psum rides the Gloo (DCN-stand-in)
    # backend instead of ICI
    mesh = make_mesh(data=2, model=1)
    state = shard_state(state, mesh)
    ds = replicate_dataset(ds, mesh)
    step = make_pigan_step(
        g, d, f, g_tx, d_tx,
        StepSettings.from_config(cfg, detach_forward=False),
        ds.param_lo, ds.param_hi,
    )
    epoch = make_parallel_epoch_fn(step, batch_size=16, mesh=mesh,
                                   with_scale=True)
    state, metrics = epoch(state, ds, jax.random.PRNGKey(1), 1.0)
    jax.block_until_ready(metrics)
    d_loss = float(metrics["d_loss"])
    g_loss = float(metrics["g_loss"])
    import math
    assert math.isfinite(d_loss) and math.isfinite(g_loss)
    # every process must observe the same (psum-reduced) losses
    print(f"proc {{pid}} losses d={{d_loss:.10f}} g={{g_loss:.10f}}", flush=True)
    """
).format(repo=REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_mesh_reduction(tmp_path):
    env = dict(os.environ)
    # one local CPU device per process (conftest forces 8 for in-process jax)
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", ""),
    ).strip()
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} ok" in out


@pytest.mark.slow
def test_two_process_sharded_train_step(tmp_path):
    """The FULL fused PI-GAN train step, batch-sharded across two real
    processes: exactly the single-host parallel code path (shard_state /
    replicate_dataset / make_parallel_epoch_fn), with the gradient
    all-reduce crossing the process boundary.  Both processes must agree
    bit-for-bit on the reduced losses."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", ""),
    ).strip()
    port = _free_port()
    script = tmp_path / "train_worker.py"
    script.write_text(TRAIN_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in (0, 1)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith(f"proc {i} losses")]
        assert line, out[-2000:]
        losses.append(line[0].split("losses ", 1)[1])
    assert losses[0] == losses[1], losses


HYBRID_WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, port = int(sys.argv[1]), sys.argv[2]
    from pigan_thz_tpu.parallel.mesh import (
        DATA_AXIS, MODEL_AXIS, initialize_distributed, make_mesh,
    )
    initialize_distributed(f"127.0.0.1:{{port}}", 2, pid)
    # hybrid topology: 2 processes (DCN stand-in) x 4 local devices (ICI
    # stand-in) -> 8 global devices
    assert jax.process_count() == 2
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 8

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    # (data=4, model=2): the row-major device layout puts the DATA axis
    # across processes (each group of 2 model-peers is process-local) —
    # the DP gradient sync rides DCN, the TP reductions stay intra-host,
    # exactly the scaling-book hybrid axis mapping (parallel/mesh.py)
    mesh = make_mesh(data=4, model=2)
    ids = np.vectorize(lambda d: d.process_index)(mesh.devices)
    assert ids.shape == (4, 2)
    # every model-axis pair is within ONE process (TP over "ICI")
    assert (ids[:, 0] == ids[:, 1]).all()
    # the data axis spans both processes (DP over "DCN")
    assert set(ids[:, 0].tolist()) == {{0, 1}}

    # DP reduction over the data axis (crosses the process boundary)
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    local = np.full((4, 8), float(pid + 1), np.float32)
    garr = jax.make_array_from_process_local_data(sharding, local, (8, 8))
    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=NamedSharding(mesh, P())
    )(garr)
    assert float(total) == 32.0 + 64.0, float(total)

    # TP matmul: weights sharded on the model axis (process-local pairs),
    # contraction emits the model-axis all-reduce
    w = jnp.arange(64.0, dtype=jnp.float32).reshape(8, 8)
    wsh = jax.device_put(w, NamedSharding(mesh, P(None, MODEL_AXIS)))
    y = jax.jit(
        lambda a, b: a @ b, out_shardings=NamedSharding(mesh, P())
    )(garr, wsh)
    # the global X is known by construction (proc0 rows 1.0, proc1 rows
    # 2.0; a cross-process array cannot be fetched directly)
    x_global = np.concatenate(
        [np.full((4, 8), 1.0, np.float32), np.full((4, 8), 2.0, np.float32)]
    )
    np.testing.assert_allclose(
        np.asarray(y), x_global @ np.asarray(w), rtol=1e-6
    )
    print(f"proc {{pid}} hybrid ok", flush=True)
    """
).format(repo=REPO)


def test_hybrid_two_process_four_device_mesh(tmp_path):
    """VERDICT r3 #3c: the DCN+ICI hybrid — 2 processes x 4 virtual
    devices each, (data=4, model=2) mesh with DP across processes and TP
    process-local, exercising parallel/mesh.py's axis mapping beyond the
    1-device-per-process Gloo test."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        re.sub(
            r"--xla_force_host_platform_device_count=\d+", "",
            env.get("XLA_FLAGS", ""),
        ).strip()
        + " --xla_force_host_platform_device_count=4"
    ).strip()
    port = _free_port()
    script = tmp_path / "hybrid_worker.py"
    script.write_text(HYBRID_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in (0, 1)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} hybrid ok" in out
