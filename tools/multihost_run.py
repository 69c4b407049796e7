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
    ap.add_argument("--spmd", action="store_true",
                    help="run the PRODUCTION-parity SPMD window step "
                         "(make_spmd_window_step_fn) instead of the "
                         "ownership-sharded tick")
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

    if args.spmd:
        return main_spmd(args, mesh)

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


def main_spmd(args, mesh):
    """Two-process run of the PRODUCTION-parity SPMD window step (the
    MULTICHIP.md as-implemented scaling path): every process replays the
    SAME deterministic single-chip warmup locally (the replicated
    LIOState), then the steady dense-moment window program runs across
    both processes — the all_gather'd undistorted shards, psum'd Grams
    and all_gather'd insert delta rows ride the cross-process
    transport."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as PS

    from better_fastlio2_tpu.config import (
        IkdtreeConfig, LIOConfig, MappingConfig, ShapesConfig,
    )
    from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
    from better_fastlio2_tpu.parallel import sharded
    from better_fastlio2_tpu.pipeline.lio import LIOPipeline, WindowInputs

    N_RAW, N_DS, W = 2048, 1024, 2
    cfg = LIOConfig()
    cfg.shapes = ShapesConfig(
        n_raw=N_RAW, n_ds=N_DS, n_imu=32, map_capacity_log2=13,
        map_bucket=4, map_max_probe=8, knn_chunk=N_DS,
        map_dense_log2=(7, 7, 6), insert_mom_budget=1024)
    cfg.mapping = MappingConfig(det_range=20.0, cube_len=200.0,
                                surf_leaf_size=0.4, extrinsic_est_en=False)
    cfg.ikdtree = IkdtreeConfig(
        max_iteration=3, filter_size_map_min=0.4, plane_cache=True,
        plane_cache_warmup=8, mom_dense=True, single_association=True,
        early_converge=True)
    dtype = jnp.float32

    groups = list(make_lio_sequence(
        duration=2.4, scan_rate=10.0, imu_rate=100.0, n_points=N_RAW,
        seed=11, noise=0.002, traj=Trajectory(t_still=0.5, speed=1.5),
    ))
    # at least one full window steady; a 0 here would make warm=groups[:-0]
    # empty and fail the dmom warmup assert with a confusing message
    n_steady = max(W, args.n_scans - args.n_scans % W)
    if n_steady >= len(groups):
        raise SystemExit(
            f"--n-scans {args.n_scans} leaves no warmup scans "
            f"(sequence has {len(groups)} groups, window {W})")
    warm, steady = groups[:-n_steady], groups[-n_steady:]

    # identical local warmup on every process -> replicated LIOState
    pipe = LIOPipeline(cfg)
    for g in warm:
        pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"],
                          g["imu_t"], g["scan_beg_abs"], g["scan_end_t"])
    assert pipe.ls is not None and pipe.ls.map.dmom is not None, (
        "warmup must reach the steady dense-moment program")

    def rep(a):
        a = np.asarray(a)
        sh = NamedSharding(mesh, PS(*([None] * a.ndim)))
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    def shard_pts(a):
        """(W, n_pts, ...) sharded over the POINT axis; every process
        holds the full array."""
        a = np.asarray(a)
        sh = NamedSharding(mesh,
                           PS(None, "dp", *([None] * (a.ndim - 2))))
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    ls = jax.tree_util.tree_map(rep, pipe.ls)
    wstep = sharded.make_spmd_window_step_fn(cfg, mesh, W, ls)
    an = rep(np.asarray(pipe.acc_norm, np.float32))

    traj_out = []
    last_end_abs = pipe.last_scan_end_abs
    for wi in range(0, len(steady), W):
        scans = steady[wi:wi + W]
        cols = [pipe._pad_points(g["pts"], g["pt_t"]) for g in scans]
        imus = [pipe._pad_imu(g["imu_acc"], g["imu_gyr"], g["imu_t"])
                for g in scans]
        rels = []
        for g in scans:
            rels.append(last_end_abs - g["scan_beg_abs"])
            last_end_abs = g["scan_beg_abs"] + g["scan_end_t"]
        win = WindowInputs(
            pts=shard_pts(np.stack([c[0] for c in cols])),
            pt_t=shard_pts(np.stack([c[1] for c in cols])),
            pt_valid=shard_pts(np.stack([c[2] for c in cols])),
            imu_acc=rep(np.stack([i[0] for i in imus])),
            imu_gyr=rep(np.stack([i[1] for i in imus])),
            imu_t=rep(np.stack([i[2] for i in imus])),
            imu_mask=rep(np.stack([i[3] for i in imus])),
            last_end_rel=rep(np.asarray(rels, np.float32)),
            scan_end_t=rep(np.asarray([g["scan_end_t"] for g in scans],
                                      np.float32)),
            scan_valid=rep(np.ones(W, bool)),
        )
        ls, infos = wstep(ls, win, an)
        iv = np.asarray(jax.device_get(infos))
        traj_out.extend(iv[:, 0:3])

    if args.out and jax.process_index() == 0:
        np.savez(args.out, traj=np.stack(traj_out))
    print(f"proc {args.process_id}: spmd ok, {len(traj_out)} scans, "
          f"end pos {traj_out[-1]}")


if __name__ == "__main__":
    main()
