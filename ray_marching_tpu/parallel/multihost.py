"""Multi-host orchestration scaffolding.

One real TPU topology = many hosts, each seeing a slice of chips. This
module wraps the standard JAX multihost bring-up (SURVEY.md §5 distributed
backend; the reference is single-process and has none of this):

* :func:`initialize` — ``jax.distributed.initialize`` with env-driven
  defaults (JAX_COORDINATOR, JAX_NUM_PROCESSES, JAX_PROCESS_ID), safe to
  call when unconfigured (single-process no-op);
* :func:`make_global_mesh` — ('host', 'chip') mesh with the host axis
  outermost so cross-host collectives ride DCN and intra-host ones ride
  ICI;
* :func:`host0_print` / :func:`is_host0` — single-writer logging;
* fail-fast barrier with timeout: a missing peer surfaces as an exception
  here rather than a silent collective hang (minimal failure-detection
  tier; re-launch from the latest checkpoint in
  ray_marching_tpu.io.checkpoint to recover).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or environment.

    Returns True if multi-process mode was initialized, False for
    single-process operation (no configuration found).
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")
    if not coordinator or num_processes is None or process_id is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _int_env(name):
    val = os.environ.get(name)
    return int(val) if val is not None else None


def is_host0() -> bool:
    return jax.process_index() == 0


def host0_print(*args, **kwargs) -> None:
    """Print from host 0 only (metrics/log single-writer discipline)."""
    if is_host0():
        print(*args, **kwargs)


def make_global_mesh(axis_names=("host", "chip")) -> Mesh:
    """A 2D mesh: hosts on the outer (DCN) axis, local chips inner (ICI)."""
    devices = np.asarray(jax.devices()).reshape(
        jax.process_count(), jax.local_device_count()
    )
    return Mesh(devices, axis_names)


_BARRIER_FN = None


def _barrier_fn():
    # Built once: a fresh lambda per call would miss pmap's
    # function-identity executable cache and retrace/recompile every
    # barrier.
    global _BARRIER_FN
    if _BARRIER_FN is None:
        _BARRIER_FN = jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")
    return _BARRIER_FN


def barrier(timeout_s: float = 120.0) -> None:
    """Cross-host sync point that fails fast instead of hanging forever.

    Uses a tiny psum across all devices; on a healthy cluster this returns
    in milliseconds. ``jax.block_until_ready`` has no timeout of its own,
    so the wait runs on a watchdog thread — if a dead peer keeps the
    collective from completing within ``timeout_s``, this raises
    TimeoutError on the caller (the documented fail-fast contract; recover
    by re-launching from the latest checkpoint).
    """
    import threading

    import jax.numpy as jnp

    x = jnp.ones((jax.local_device_count(),))
    out = _barrier_fn()(x)
    done = threading.Event()
    err: list[BaseException] = []

    def wait():
        try:
            jax.block_until_ready(out)
        except BaseException as exc:  # runtime error from a dead peer
            err.append(exc)
        finally:
            done.set()

    t = threading.Thread(target=wait, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        raise TimeoutError(
            f"barrier: collective did not complete within {timeout_s}s "
            f"(process {jax.process_index()}/{jax.process_count()}) — "
            "a peer is likely dead; restart from the latest checkpoint"
        )
    if err:
        raise err[0]
