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
