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
