"""2-process localhost jax.distributed coverage (SURVEY.md §4.3c).

Spawns two real python processes that initialize jax.distributed against a
localhost coordinator (CPU backend), build the global mesh through
``parallel.mesh``, and psum a per-process value — covering the multi-host
init path that the virtual-mesh tests cannot reach. Marked slow; skipped
automatically if the runtime doesn't support CPU multi-process.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_WORKER = textwrap.dedent(
    """
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    coord, pid = sys.argv[1], int(sys.argv[2])
    from rgbd_pose_estimation_tpu.parallel.mesh import distributed_init
    distributed_init(coord, num_processes=2, process_id=pid)
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P
    import numpy as np
    devs = jax.devices()
    assert len(devs) == 2, devs
    mesh = Mesh(np.asarray(devs).reshape(2, 1), ("host", "chip"))
    f = shard_map(
        lambda x: jax.lax.psum(x, ("host", "chip")),
        mesh=mesh, in_specs=P(), out_specs=P(),
    )
    import jax.numpy as jnp
    total = f(jnp.asarray(float(pid + 1)))
    print("TOTAL", float(np.asarray(jax.device_get(total))), flush=True)
    """
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_psum(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # Each process must see exactly one local CPU device.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=180)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("distributed localhost launch timed out on this runtime")
    for rc, out, err in outs:
        if rc != 0 and "not implemented" in err.lower():
            pytest.skip(f"runtime lacks CPU multi-process support: {err[-200:]}")
        assert rc == 0, err[-2000:]
        # psum of (1 + 2) across both processes.
        assert "TOTAL 3.0" in out
