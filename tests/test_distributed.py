"""Multi-process bring-up: ``init_distributed`` with a REAL second process.

SURVEY.md §2.4's comm-backend row is the reference's implicit NCCL/torchrun
environment; the TPU-native replacement is ``jax.distributed.initialize`` +
a spanning mesh (parallel/mesh.py:init_distributed). Every other
multi-device artifact in this suite is a single-process virtual mesh — this
test spawns TWO OS processes (2 virtual CPU devices each, Gloo collectives),
builds the 4-device spanning mesh through the library entry point, and takes
one data-parallel gradient step whose grads must equal the single-process
reference.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import json, os, sys
    import jax

    jax.config.update("jax_platforms", "cpu")
    pid, coord = int(sys.argv[1]), sys.argv[2]

    from robustsq_whisper_tpu.parallel.mesh import (
        batch_shardings, init_distributed, make_mesh, replicated,
    )

    n = init_distributed(
        coordinator_address=coord, num_processes=2, process_id=pid
    )
    assert n == 4, n  # spanning device count: 2 processes x 2 local devices
    assert jax.process_count() == 2 and jax.local_device_count() == 2

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh()  # all 4 devices on the data axis
    assert mesh.shape["data"] == 4, dict(mesh.shape)

    # deterministic global batch 8, each process holding rows [4p, 4p+4)
    full_x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3) / 10.0
    full_y = np.linspace(-1.0, 1.0, 8, dtype=np.float32)
    sh = NamedSharding(mesh, P("data"))
    x = jax.make_array_from_process_local_data(
        sh, full_x[4 * pid : 4 * pid + 4], (8, 3)
    )
    y = jax.make_array_from_process_local_data(
        sh, full_y[4 * pid : 4 * pid + 4], (8,)
    )
    w = jax.device_put(jnp.asarray([0.3, -0.2, 0.1]), replicated(mesh))

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    # one DP step: grads of the data-sharded batch — XLA inserts the
    # cross-process psum from the shardings (ICI/DCN on real pods; Gloo here)
    g = jax.jit(jax.grad(loss))(w, x, y)
    g_local = np.asarray(jax.device_get(g))
    print("GRADS " + json.dumps([pid, g_local.tolist()]), flush=True)
    jax.distributed.shutdown()
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_init_distributed_two_process_dp_step(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORM_NAME", None)
    # python adds the SCRIPT's dir (tmp_path) to sys.path, not the cwd
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), coord],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        if p.returncode != 0:
            pytest.fail(
                f"worker failed rc={p.returncode}\nstdout:{out[-2000:]}\n"
                f"stderr:{err[-2000:]}"
            )
        outs.append(out)

    grads = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("GRADS "):
                pid, g = json.loads(line[len("GRADS "):])
                grads[pid] = np.asarray(g, np.float32)
    assert set(grads) == {0, 1}

    # single-process reference on the same global batch
    full_x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3) / 10.0
    full_y = np.linspace(-1.0, 1.0, 8, dtype=np.float32)
    w = np.asarray([0.3, -0.2, 0.1], np.float32)
    resid = full_x @ w - full_y
    ref = 2.0 * full_x.T @ resid / len(full_y)
    for pid in (0, 1):
        np.testing.assert_allclose(grads[pid], ref, rtol=1e-5, atol=1e-6)
    # both processes computed the identical replicated gradient
    np.testing.assert_array_equal(grads[0], grads[1])
