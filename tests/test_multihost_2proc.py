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


_CHILD_TRAIN = textwrap.dedent("""
    import sys
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', 2)
    jax.config.update('jax_enable_x64', True)

    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    from ray_marching_tpu.parallel import multihost

    assert multihost.initialize(coordinator, num_procs, pid) is True

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ray_marching_tpu.parallel.sharding import make_mesh, make_train_step, \\
        ray_partition_spec, shard_render
    from ray_marching_tpu.render.pipeline import Renderer, RenderConfig
    from ray_marching_tpu.scene import registry

    # The DCN-shaped program: the 'rows' axis spans all 4 devices, so the
    # process (host) boundary sits INSIDE the sharded image axis — the
    # shader min/max collectives and the replicated-param grad all-reduce
    # cross it in forward AND backward (exactly what a ('host','chip')
    # pod mesh exercises; axis NAMES follow ray_partition_spec).
    mesh = make_mesh(shape=(4, 1), axis_names=('rows', 'cols'))

    px = 3.45e-6
    w = h = 64
    cfg = RenderConfig(px_width=w, px_height=h, focal_length=px * h,
                       sensor_width=px * w, sensor_height=px * h,
                       marching_steps=8)
    r = Renderer(registry.make_scene('test_scene2'), cfg,
                 dtype=jnp.float64, grid_dtype=np.float64)
    q = jnp.asarray([[0.0, 0.0, 1.0, 0.0]], jnp.float64)
    t = jnp.asarray([[0.0, 0.2, 2.5]], jnp.float64)

    spec = ray_partition_spec(mesh)
    target_shard = NamedSharding(mesh, spec)
    target = jax.make_array_from_callback(
        (1, h, w, 3), target_shard,
        lambda idx: np.zeros((1, h, w, 3), np.float64)[idx])

    # Grad parity: the sharded loss gradient must equal the single-device
    # computation (the collectives inside forward and backward are exact).
    render_sharded = shard_render(r, mesh, mode=0, degree=2)

    def loss_sharded(params):
        img = render_sharded(params, q, t)
        return jnp.mean(jnp.square(img))

    loss_s, grads_s = jax.value_and_grad(loss_sharded)(r.init_params)

    def loss_local(params):
        img = r.render(params, q, t, mode=0, degree=2)
        return jnp.mean(jnp.square(img))

    loss_l, grads_l = jax.jit(jax.value_and_grad(loss_local))(r.init_params)
    assert np.isfinite(float(loss_s))
    np.testing.assert_allclose(float(loss_s), float(loss_l), rtol=1e-12)
    for gs, gl in zip(jax.tree_util.tree_leaves(grads_s),
                      jax.tree_util.tree_leaves(grads_l)):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gl),
                                   rtol=1e-9, atol=1e-12)

    # 8 real optimizer steps across the process boundary.
    optimizer = optax.adam(1e-2)
    step = make_train_step(r, mesh, optimizer, mode=0, degree=2)
    params = r.init_params
    opt_state = optimizer.init(params)
    losses = []
    for _ in range(8):
        params, opt_state, loss = step(params, opt_state, target, q, t)
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses), losses
    assert losses[-1] <= losses[0], losses

    multihost.barrier()
    print(f'TRAIN_OK pid={pid} losses={losses[0]:.6f}->{losses[-1]:.6f}')
""")


def _launch_two(tmp_path, child_src, timeout=600):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    script = tmp_path / "child.py"
    script.write_text(child_src)
    repo_root = str(Path(__file__).resolve().parent.parent)
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
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
            out, err = p.communicate(timeout=timeout)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rc, out, err in outs:
        assert rc == 0, f"child failed rc={rc}\nstdout:\n{out}\nstderr:\n{err}"
    return outs


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("RM_TPU_SKIP_2PROC") == "1",
    reason="2-process launch disabled",
)
def test_two_process_train_step_cpu(tmp_path):
    """A REAL differentiated render + train step crossing the 2-process
    boundary: sharded-vs-local grad parity (f64, rtol 1e-9) and 8 finite,
    non-increasing Adam steps (SURVEY.md §4 test strategy item 3)."""
    outs = _launch_two(tmp_path, _CHILD_TRAIN)
    assert "TRAIN_OK pid=0" in outs[0][1]
    assert "TRAIN_OK pid=1" in outs[1][1]


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
