"""Multi-host bootstrap and asynchronous backend execution.

Replaces the reference's process/thread runtime (SURVEY.md §2.6):

* P4 (the 1 Hz loop-closure std::thread sharing keyframes under a mutex,
  laserMapping.cpp:2216): `AsyncBackend` dispatches pose-graph
  optimization to a chosen device WITHOUT blocking the front end — JAX's
  async dispatch is the "thread", `jax.Array.is_ready()` the poll, and
  the functional graph snapshot the lock-free handoff.  On a single chip
  the optimizer still overlaps the host-side scan prep; with 2+ local
  devices it runs truly concurrently on its own chip.
* P5/P6 (ROS TCPROS between odometry and relocalization nodes, pthread
  mutexes, filesystem sessions): multi-host runs use
  `init_distributed()` (jax.distributed) — each host runs its own front
  end over its scan stream shard; backend collectives (the psum'd GN of
  parallel/sharded.py) ride ICI/DCN.  The session directory stays the
  inter-application interchange format.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["init_distributed", "AsyncBackend"]


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None):
    """jax.distributed bootstrap for multi-host runs (no-op if standalone).

    The single-controller-per-host model: call once per host before any
    jax computation; afterwards jax.devices() spans the slice and the
    shard_map programs in parallel/sharded.py run over all chips.
    """
    if coordinator is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


class AsyncBackend:
    """Non-blocking pose-graph optimization on a designated device.

    Usage (mirrors the reference's loop thread handoff,
    laserMapping.cpp:1010-1017 queue + :584-609 consumption):

        ab = AsyncBackend(device=jax.devices()[-1])
        ab.submit(graph)          # after adding a loop factor
        ...
        res = ab.poll()           # each scan; None until ready
        if res is not None:
            poses = res           # apply corrections

    `submit` places the graph on the backend device and enqueues the
    jitted optimizer; the front end keeps dispatching its own work.
    """

    def __init__(self, device=None, iters: int = 6, cg_iters: int = 50):
        self.device = device or jax.devices()[-1]
        self.iters = iters
        self.cg_iters = cg_iters
        self._pending = None
        self._tag = None

        from ..backend.posegraph import optimize

        self._opt = jax.jit(
            lambda g: optimize(g, iters=iters, cg_iters=cg_iters).poses,
        )

    @property
    def busy(self) -> bool:
        return self._pending is not None

    def submit(self, graph, tag=None) -> bool:
        """Enqueue optimization of a graph snapshot; returns False if an
        optimization is already in flight (the reference's thread also
        processes one loop batch at a time).  `tag` (e.g. the keyframe
        count at snapshot time) is handed back with the result so the
        consumer can apply a STALE result correctly — keyframes created
        after the snapshot are not in the optimized array."""
        if self._pending is not None:
            return False
        g_dev = jax.device_put(graph, self.device)
        self._pending = self._opt(g_dev)
        self._tag = tag
        return True

    def poll(self):
        """Returns (optimized poses (np.ndarray), tag) once ready, else
        None."""
        if self._pending is None:
            return None
        try:
            ready = self._pending.is_ready()
        except AttributeError:  # older jax: block (degrades gracefully)
            ready = True
        if not ready:
            return None
        out = np.asarray(self._pending)
        tag, self._pending, self._tag = self._tag, None, None
        return out, tag

    def wait(self):
        """Block for the in-flight optimization (shutdown/flush path);
        returns (poses, tag) or None."""
        if self._pending is None:
            return None
        out = np.asarray(self._pending)
        tag, self._pending, self._tag = self._tag, None, None
        return out, tag
