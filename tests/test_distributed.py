"""Multi-host bootstrap (parallel/distributed.py): the single-process no-op,
and a REAL two-process coordinator run — each process brings one CPU device,
initializes the distributed runtime, and a psum over the global 2-device mesh
must see both processes' shards (the CPU analogue of a 2-host TPU pod)."""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest


def test_single_process_noop():
    from feature_detector_tpu.parallel import distributed

    assert distributed.initialize() is False  # no coordinator configured
    info = distributed.process_info()
    assert info["process_count"] == 1
    assert info["global_devices"] >= 1


_WORKER = textwrap.dedent(
    """
    import json, os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, "/root/repo")
    from feature_detector_tpu.parallel import distributed

    ok = distributed.initialize()
    assert ok, "expected distributed init"
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = distributed.global_data_mesh()
    pid = jax.process_index()
    # Each process contributes its rank+1; the global psum must be 1+2=3.
    from jax import shard_map
    @jax.jit
    def allsum(x):
        return shard_map(
            lambda v: jax.lax.psum(v, "data"),
            mesh=mesh, in_specs=P("data"), out_specs=P(),
        )(x)

    local = jnp.asarray([float(pid + 1)])
    g = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local, (2,)
    )
    out = allsum(g)
    print(json.dumps({"pid": pid, "sum": float(out.addressable_data(0)[0])}))
    """
)


@pytest.mark.slow
def test_two_process_psum(tmp_path):
    # Free port for the coordinator.
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    procs = []
    for pid in range(2):
        env = {
            **os.environ,
            "JAX_PLATFORMS": "cpu",
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
        }
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-800:]
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert {o["pid"] for o in outs} == {0, 1}
    assert all(o["sum"] == 3.0 for o in outs), outs
