"""Fake 2-process multihost bring-up (SURVEY.md §4.3): two CPU
``jax.distributed`` processes exercise initialize → make_global_mesh
(shape (2, n)) → cross-process psum → barrier → host0-only logging,
without real pods."""

import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

_CHILD = textwrap.dedent("""
    import sys
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 2)

    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from ray_marching_tpu.parallel import multihost

    assert multihost.initialize(coordinator, num_procs, pid) is True
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.process_index() == pid

    mesh = multihost.make_global_mesh()
    assert mesh.axis_names == ('host', 'chip')
    assert mesh.devices.shape == (num_procs, 2), mesh.devices.shape

    # Cross-process collective: psum of ones over every device.
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    total = jax.shard_map(
        lambda x: jax.lax.psum(x, ('host', 'chip')),
        mesh=mesh, in_specs=P('host', 'chip'), out_specs=P(None, None),
    )(jnp.ones((num_procs, 2)))
    assert float(total[0, 0]) == num_procs * 2, total

    multihost.barrier()
    assert multihost.is_host0() == (pid == 0)
    multihost.host0_print(f'HOST0_LINE from pid={pid}')
    print(f'CHILD_OK pid={pid}')
""")


@pytest.mark.skipif(
    os.environ.get("RM_TPU_SKIP_2PROC") == "1",
    reason="2-process launch disabled",
)
def test_two_process_distributed_cpu(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    repo_root = str(Path(__file__).resolve().parent.parent)
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    # The children pick their own CPU platform post-import; scrub any
    # inherited forcing that could race the sitecustomize preimport.
    env.pop("JAX_COORDINATOR", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=repo_root,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=300)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rc, out, err in outs:
        assert rc == 0, f"child failed rc={rc}\nstdout:\n{out}\nstderr:\n{err}"
    assert "CHILD_OK pid=0" in outs[0][1]
    assert "CHILD_OK pid=1" in outs[1][1]
    # host0-only logging: the line appears on process 0 and nowhere else.
    assert "HOST0_LINE from pid=0" in outs[0][1]
    assert "HOST0_LINE" not in outs[1][1]
