"""Two-process jax.distributed run of the sharded scan tick (CPU).

Each process hosts one virtual CPU device; jax.distributed.initialize
stitches them into a 2-device global mesh, and make_sharded_step_fn's
shard_map program runs across BOTH processes — the collectives (psum'd
normal equations / moment partials, all_gather'd downsample) ride the
cross-process transport, exercising the true multi-host path that a
2-host TPU slice would use over DCN (SURVEY.md §2.6 P5/P6; replaces the
reference's ROS-TCPROS inter-node transport).

Launched pairwise by tests/test_multihost.py (or by hand):

    python tools/multihost_run.py --process-id 0 --num-processes 2 \
        --out /tmp/mh0.npz &
    python tools/multihost_run.py --process-id 1 --num-processes 2 \
        --out /tmp/mh1.npz

Process 0 writes the resulting trajectory; compare against a
single-process run of the same program for equality.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default="127.0.0.1:9382")
    ap.add_argument("--out", default=None)
    ap.add_argument("--n-scans", type=int, default=6)
    ap.add_argument("--local-devices", type=int, default=1)
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from better_fastlio2_tpu.parallel.distributed import init_distributed

    if args.num_processes > 1:
        init_distributed(
            coordinator=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from better_fastlio2_tpu.config import (
        IkdtreeConfig, LIOConfig, MappingConfig, ShapesConfig,
    )
    from better_fastlio2_tpu.core import imu as imu_mod
    from better_fastlio2_tpu.core.state import identity_state, init_P
    from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
    from better_fastlio2_tpu.parallel import sharded

    n_dev = len(jax.devices())
    assert n_dev == args.num_processes * args.local_devices, (
        n_dev, args.num_processes, args.local_devices)
    mesh = sharded.make_mesh(jax.devices())

    cfg = LIOConfig()
    N_RAW = 2048
    cfg.shapes = ShapesConfig(n_raw=N_RAW, n_ds=N_RAW, n_imu=16,
                              map_capacity_log2=12, map_bucket=4,
                              map_max_probe=8, knn_chunk=N_RAW)
    cfg.mapping = MappingConfig(det_range=60.0, cube_len=400.0,
                                surf_leaf_size=0.5, extrinsic_est_en=False)
    cfg.ikdtree = IkdtreeConfig(max_iteration=3, filter_size_map_min=0.5,
                                plane_cache=True)
    dtype = jnp.float32

    step = sharded.make_sharded_step_fn(cfg, mesh)
    msh = sharded.make_sharded_map(mesh, capacity_log2_per_dev=12,
                                   bucket=4, voxel_size=0.5, moments=True)
    x, P = identity_state(dtype), init_P(dtype)

    def rep(a):
        """Replicated global array from identical per-process data."""
        a = np.asarray(a)
        sh = NamedSharding(mesh, PS(*([None] * a.ndim)))
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    def shard_rows(a):
        """Row-sharded global array; every process holds the full a."""
        a = np.asarray(a)
        sh = NamedSharding(mesh, PS("dp"))
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    groups = list(make_lio_sequence(
        duration=args.n_scans / 10.0, scan_rate=10.0, imu_rate=100.0,
        n_points=N_RAW, seed=11, noise=0.002,
        traj=Trajectory(t_still=0.2, speed=1.5),
    ))

    traj_out = []
    last_acc_w = np.zeros(3, np.float32)
    last_gyr_b = np.zeros(3, np.float32)
    last_end_rel = 0.0
    for gi, g in enumerate(groups[: args.n_scans]):
        pts = np.zeros((N_RAW, 3), np.float32)
        n = min(len(g["pts"]), N_RAW)
        pts[:n] = g["pts"][:n]
        pt_t = np.zeros(N_RAW, np.float32)
        pt_t[:n] = g["pt_t"][:n]
        pv = np.zeros(N_RAW, bool)
        pv[:n] = True

        m = cfg.shapes.n_imu
        ts = np.full(m, np.inf, np.float32)
        acc = np.zeros((m, 3), np.float32)
        gyr = np.zeros((m, 3), np.float32)
        mask = np.zeros(m, bool)
        k = min(len(g["imu_t"]), m)
        ts[:k] = g["imu_t"][:k]
        acc[:k] = g["imu_acc"][:k]
        gyr[:k] = g["imu_gyr"][:k]
        mask[:k] = True
        batch = imu_mod.ImuBatch(
            acc=rep(acc), gyr=rep(gyr), t=rep(ts), mask=rep(mask))

        x, P, msh, tail = step(
            x, P, msh, shard_rows(pts), shard_rows(pt_t), shard_rows(pv),
            batch, rep(np.float32(last_end_rel)),
            rep(np.float32(g["scan_end_t"])), rep(np.float32(9.81)),
            rep(np.full(3, -200.0, np.float32)),
            rep(np.full(3, 200.0, np.float32)),
            rep(last_acc_w), rep(last_gyr_b),
            rep(np.asarray(gi < 2)),  # 5-NN warmup for 2 scans
        )
        tail_np = np.asarray(jax.device_get(tail))
        last_acc_w, last_gyr_b = tail_np[0], tail_np[1]
        last_end_rel = 0.0
        traj_out.append(np.asarray(jax.device_get(x.pos)))

    if args.out and jax.process_index() == 0:
        np.savez(args.out, traj=np.stack(traj_out))
    print(f"proc {args.process_id}: ok, {len(traj_out)} scans, "
          f"end pos {traj_out[-1]}")


if __name__ == "__main__":
    main()
