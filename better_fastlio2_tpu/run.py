"""Command-line runners — the analog of the reference's four executables.

The reference builds fastlio_sam_mapping, multi_session, online_relo and
object_update (reference: CMakeLists.txt:77-87, launched via
launch/*.launch with per-dataset YAML).  Here they are subcommands:

    python -m better_fastlio2_tpu.run mapping  --dataset kitti:<dir> \
        [--config cfg.yaml] [--output session_dir] [--loop]
    python -m better_fastlio2_tpu.run mapping  --dataset synthetic \
        [--duration 8] ...
    python -m better_fastlio2_tpu.run multi_session --central <dir> \
        --query <dir> --output <dir>
    python -m better_fastlio2_tpu.run online_relo --prior <dir> \
        --dataset kitti:<dir>
    python -m better_fastlio2_tpu.run object_update --central <dir> \
        --query <dir> --output <dir>

Outputs keep the reference session-directory contract (SURVEY.md §1) and
a fast_lio_time_log.csv-compatible timing dump.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

# Honor JAX_PLATFORMS even when a sitecustomize pins a backend plugin:
# the env var is applied as a config update (the var alone is overridden
# by the plugin's early initialization in some deployments).
if os.environ.get("JAX_PLATFORMS"):
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass


def _groups_from_dataset(spec: str, args):
    if spec == "synthetic":
        from .io.synthetic import Trajectory, make_lio_sequence

        return make_lio_sequence(
            duration=args.duration, n_points=args.n_points, seed=args.seed,
            traj=Trajectory(t_still=1.0, speed=2.0),
        )
    if spec == "synthetic-outdoor":
        # the hostile outdoor world with labelled movers: groups carry
        # gt_dynamic, so a --dynamic run writes dynamic_report.json
        # (PR/RR/F1 vs ground truth — analysis.py analog).  The sensor
        # rides at 2.0 m (truck mount) so the car-height movers fall
        # inside the SSC PD gates at the default sensor_height=0.4 —
        # the same geometry tests/test_perception.py validates.
        from .io.synthetic import (OutdoorWorld, Trajectory,
                                   make_lio_sequence)

        return make_lio_sequence(
            duration=args.duration, n_points=args.n_points, seed=args.seed,
            traj=Trajectory(t_still=1.0, speed=2.0, height=2.0),
            world=OutdoorWorld(seed=args.seed), labels=True,
        )
    kind, _, path = spec.partition(":")
    if kind == "kitti":
        from .io.kitti import KittiRawSequence

        return KittiRawSequence(path).groups(
            blind=args.blind, point_filter_num=args.point_filter_num
        )
    if kind == "mulran":
        from .io.mulran import MulranSequence

        return MulranSequence(path).groups(
            blind=args.blind, point_filter_num=args.point_filter_num
        )
    if kind == "nclt":
        from .io.nclt import NcltSequence

        return NcltSequence(path).groups(
            blind=args.blind, point_filter_num=args.point_filter_num
        )
    raise SystemExit(f"unknown dataset spec: {spec}")


def cmd_mapping(args):
    import signal

    from .config import LIOConfig, load_yaml
    from .pipeline.slam import SLAMPipeline
    from .utils.timing import ScanTimer

    cfg = load_yaml(args.config) if args.config else LIOConfig()
    cfg.loop.enable = bool(args.loop)
    cfg.dynamic_removal = bool(getattr(args, 'dynamic', False))
    # --sensor-height defaults to None so the synthetic-outdoor truck-
    # mount override below fires only when the user did NOT set the flag
    # (an explicit --sensor-height 0.4 stays 0.4)
    sh_arg = getattr(args, 'sensor_height', None)
    cfg.sensor_height = 0.4 if sh_arg is None else float(sh_arg)
    cfg.ssc_sensor_height = getattr(args, 'ssc_sensor_height', None)
    if (args.dataset == "synthetic-outdoor" and cfg.dynamic_removal
            and sh_arg is None):
        # truck-mount geometry of the labelled-mover world: ground
        # segmentation needs the true 2.0 m mount, the SSC PD band
        # keeps the near-ground tuning (see _groups_from_dataset)
        cfg.sensor_height = 2.0
        cfg.ssc_sensor_height = cfg.ssc_sensor_height or 0.4
        cfg.dyn_track_gap = 5  # 0.5 s tracking gap (overlap-mode fallback)
        # K-frame appearance test: the 10 Hz moving-sensor operating
        # point where single-gap occupancy overlap has no signal
        # (LIOConfig.dyn_track_mode)
        cfg.dyn_track_mode = "appearance"
    if getattr(args, "gps", False):
        cfg.gps.enable = True
    # async pose-graph optimization by default when loops are on — the
    # analog of the reference's detached 1 Hz loop-closure thread
    # (laserMapping.cpp:2216); --sync-backend forces in-line optimization
    pipe = SLAMPipeline(
        cfg,
        async_backend=cfg.loop.enable
        and not getattr(args, "sync_backend", False),
    )
    if getattr(args, "dynamic_dump", None):
        pipe.dynamic_dump_dir = args.dynamic_dump

    # GPS stream (config #3: datasets with GPS; the reference stubbed
    # addGPSFactor at laserMapping.cpp:689 — here it is live).  Synthetic
    # runs synthesize noisy fixes from ground truth; MulRan fixes come
    # from global_pose.csv translations.
    gps_fixes: list[tuple[float, np.ndarray, float]] = []
    if cfg.gps.enable:
        rng = np.random.default_rng(12345)
        noise = float(getattr(args, "gps_noise", 0.5))
        rate = float(getattr(args, "gps_rate", 1.0))
        kind, _, path = args.dataset.partition(":")
        if args.dataset == "synthetic":
            from .io.synthetic import Trajectory

            traj = Trajectory(t_still=1.0, speed=2.0)
            t = 0.0
            while t < args.duration:
                gps_fixes.append(
                    (t, traj.pos(t) + rng.normal(scale=noise, size=3),
                     noise * noise))
                t += 1.0 / rate
        elif kind == "mulran":
            from .io.mulran import MulranSequence

            t_g, poses = MulranSequence(path).ground_truth()
            stride = max(1, int(round(len(t_g) / max(
                1.0, (t_g[-1] - t_g[0]) * rate))))
            for k in range(0, len(t_g), stride):
                gps_fixes.append((float(t_g[k]), poses[k][:, 3].copy(),
                                  noise * noise))
    gps_cursor = 0
    timer = ScanTimer()
    n = 0

    # camera colorization (reference publish_frame_world_color,
    # laserMapping.cpp:310-392, gated by camera_en): on --camera or the
    # yaml camera_en, each keyframe cloud is colorized through the
    # yaml's camera model and written as ColoredPCDs/%06d.pcd at save
    cam_on = (getattr(cfg, "camera", None) is not None
              and (getattr(args, "camera", False) or cfg.camera_en))
    if getattr(args, "camera", False) and getattr(cfg, "camera", None) is None:
        print("--camera needs a `camera:` block in the config; ignoring",
              file=sys.stderr)

    def _save(dest):
        os.makedirs(dest, exist_ok=True)
        # consistency check before writing (laserMapping.cpp:2465-2475:
        # #keyframes must equal #poses or the saver aborts)
        assert len(pipe.keyframes) == int(pipe.graph.n_poses), (
            "keyframe/pose count mismatch — refusing to write session")
        pipe.save_session(dest)
        timer.write_csv(os.path.join(dest, "fast_lio_time_log.csv"))
        if cam_on:
            from .perception.colorize import (CameraModel,
                                              load_image_bgr,
                                              write_colored_keyframes)

            cam = CameraModel.from_config(cfg.camera)
            img_dir = getattr(args, "camera_images", None)
            image_for = None
            if img_dir:
                def image_for(k):
                    for ext in (".png", ".jpg", ".npy"):
                        p = os.path.join(img_dir, f"{k:06d}{ext}")
                        if os.path.exists(p):
                            return load_image_bgr(p)
                    from .perception.colorize import test_pattern_image

                    return test_pattern_image(cam.width, cam.height)
            nc = write_colored_keyframes(
                os.path.join(dest, "ColoredPCDs"), pipe.keyframes, cam,
                image_for)
            print(f"{nc} colored keyframe PCDs written", file=sys.stderr)
        print(f"session written to {dest}", file=sys.stderr)

    # graceful SIGINT save (the reference's SigHandle + final saver,
    # laserMapping.cpp:1041-1047, 2465); SIGUSR1 = the /save_map service
    # analog (mid-run snapshot without stopping)
    interrupted = {"flag": False}
    signal.signal(signal.SIGINT,
                  lambda *_: interrupted.__setitem__("flag", True))
    if hasattr(signal, "SIGUSR1") and args.output:
        signal.signal(
            signal.SIGUSR1, lambda *_: _save(args.output))

    if args.state_log and args.output:
        os.makedirs(args.output, exist_ok=True)
        state_log = open(os.path.join(args.output, "pos_log.txt"), "w")
        # per-frame filter state dumps (laserMapping.cpp:2358-2359):
        # mat_pre = post-predict state, mat_out = post-update state
        mat_pre = open(os.path.join(args.output, "mat_pre.txt"), "w")
        mat_out = open(os.path.join(args.output, "mat_out.txt"), "w")
    else:
        state_log = mat_pre = mat_out = None
    if state_log is None and args.state_log:
        print("--state-log needs --output; ignoring", file=sys.stderr)

    dyn_pred, dyn_gt = [], []  # PR/RR/F1 accumulation (labelled worlds)
    for g in _groups_from_dataset(args.dataset, args):
        # drain GPS fixes up to this scan's end into the backend
        t_end = g["scan_beg_abs"] + g["scan_end_t"]
        while gps_cursor < len(gps_fixes) and gps_fixes[gps_cursor][0] <= t_end:
            tg, pg_, cv = gps_fixes[gps_cursor]
            pipe.feed_gps(tg, pg_, cv)
            gps_cursor += 1
        timer.begin_scan(g["scan_beg_abs"])
        with timer.stage("total_scan"):
            out = pipe.process_scan(
                g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"], g["imu_t"],
                g["scan_beg_abs"], g["scan_end_t"],
            )
        # dynamic-removal quality vs ground truth (synthetic-outdoor +
        # --dynamic): accumulate this scan's removal decision
        mask = pipe.__dict__.pop("last_dynamic_mask", None)
        if mask is not None and g.get("gt_dynamic") is not None:
            dyn_pred.append(mask)
            dyn_gt.append(g["gt_dynamic"])
        timer.count("scan_points", len(g["pts"]))
        timer.end_scan()
        n += 1
        if out is not None and state_log is not None:
            # dump_lio_state_to_log analog (laserMapping.cpp:1049-1063):
            # time, position, rotation (quat), per-scan
            row = [g["scan_beg_abs"], *out["pos"], *out["quat"]]
            state_log.write(" ".join(f"{v:.6f}" for v in row) + "\n")
            # mat_pre/mat_out (laserMapping.cpp:2358-2359): predicted vs
            # updated state per frame, plus filter internals
            pre = [g["scan_beg_abs"], *out["prop_pos"], *out["prop_quat"]]
            mat_pre.write(" ".join(f"{v:.6f}" for v in pre) + "\n")
            post = [g["scan_beg_abs"], *out["pos"], *out["quat"],
                    *out["vel"], *out["bg"], *out["ba"], *out["grav"]]
            mat_out.write(" ".join(f"{v:.6f}" for v in post) + "\n")
        if out is not None and n % 50 == 0:
            print(
                f"scan {n}: pos={np.round(out['pos'], 2)} "
                f"kfs={out['n_keyframes']} loops={out['n_loops']}",
                file=sys.stderr,
            )
        if args.max_scans and n >= args.max_scans:
            break
        if interrupted["flag"]:
            print("SIGINT: stopping and saving", file=sys.stderr)
            break
    if state_log is not None:
        state_log.close()
        mat_pre.close()
        mat_out.close()
    if args.output:
        _save(args.output)
    summary = {
        "scans": n,
        "keyframes": len(pipe.keyframes),
        "loops": len(pipe.loop_pairs),
        "scans_per_sec": round(timer.scans_per_sec(skip=8), 2),
    }
    if dyn_pred:
        # dynamic-removal quality report vs labelled ground truth (the
        # reference's include/analysis/analysis.py evaluation, run
        # in-line): PR/RR/F1 over the scans that HAVE a tracked grid —
        # the first `dyn_track_gap` frames predict all-static by
        # construction and would deflate recall on short runs
        from .io.evaluate import pr_rr_f1

        if getattr(cfg, "dyn_track_mode", "overlap") == "appearance":
            gap = max(2, int(getattr(cfg, "dyn_track_k", 24)))
        else:
            gap = max(1, int(getattr(cfg, "dyn_track_gap", 1)))
        scored_pred = dyn_pred[gap:] if len(dyn_pred) > gap else dyn_pred
        scored_gt = dyn_gt[gap:] if len(dyn_gt) > gap else dyn_gt
        pr, rr, f1 = pr_rr_f1(np.concatenate(scored_pred),
                              np.concatenate(scored_gt))
        report = {"precision": round(float(pr), 4),
                  "recall": round(float(rr), 4),
                  "f1": round(float(f1), 4),
                  "n_scans": len(dyn_pred),
                  "n_scans_scored": len(scored_pred),
                  "n_points": int(sum(len(p) for p in dyn_pred))}
        summary["dynamic_pr_rr_f1"] = [report["precision"],
                                       report["recall"], report["f1"]]
        if args.output:
            os.makedirs(args.output, exist_ok=True)
            with open(os.path.join(args.output,
                                   "dynamic_report.json"), "w") as f:
                json.dump(report, f, indent=1)
    print(json.dumps(summary))


def cmd_multi_session(args):
    from .apps.multi_session import MultiSessionConfig, MultiSessionMerger

    m = MultiSessionMerger(args.central, args.query, MultiSessionConfig())
    stats = m.run()
    m.write_outputs(args.output)
    # getReloKeyFrames analog: the merged keyframe set as a standard
    # session dir so `run.py online_relo --prior .../merged_session`
    # relocalizes against both sessions (Incremental_mapping.cpp:1080)
    m.export_merged_session(os.path.join(args.output, "merged_session"))
    print(json.dumps(stats))


def cmd_online_relo(args):
    from .apps.online_relo import OnlineRelocalizer, ReloConfig
    from .config import LIOConfig, load_yaml
    from .pipeline.lio import LIOPipeline

    cfg = load_yaml(args.config) if args.config else LIOConfig()
    lio = LIOPipeline(cfg)
    # the relo: block (searchDis/searchNum/trustDis/regMode — the
    # reference's config/online_relo.yaml keys) rides the same file
    rcfg = (ReloConfig.from_yaml(args.config) if args.config
            else ReloConfig())
    relo = OnlineRelocalizer(args.prior, rcfg)
    results = []
    for g in _groups_from_dataset(args.dataset, args):
        out = lio.process_scan(
            g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"], g["imu_t"],
            g["scan_beg_abs"], g["scan_end_t"],
        )
        if out is None:
            continue
        odom = np.concatenate([out["quat"], out["pos"]]).astype(np.float64)
        r = relo.process(g["pts"], odom)
        if r is not None:
            results.append(r)
        if args.max_scans and len(results) >= args.max_scans:
            break
    if args.output:
        os.makedirs(args.output, exist_ok=True)
        with open(os.path.join(args.output, "relo_pose.txt"), "w") as f:
            for r in results:
                f.write(" ".join(f"{v:.6f}" for v in r["pose"]) + "\n")
    modes = [r["mode"] for r in results]
    print(
        json.dumps(
            {
                "frames": len(results),
                "relo_frames": modes.count("relo"),
                "lio_frames": modes.count("lio"),
                "initialized": relo.initialized,
            }
        )
    )


def cmd_object_update(args):
    from .apps.object_update import ObjectUpdateConfig, ObjectUpdater

    upd = ObjectUpdater(args.central, args.query, ObjectUpdateConfig())
    res = upd.run()
    upd.write_outputs(res, args.output)
    print(
        json.dumps(
            {
                k: (len(v) if isinstance(v, list) else v)
                for k, v in res.items()
            }
        )
    )


def main(argv=None):
    p = argparse.ArgumentParser(prog="better_fastlio2_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    mp = sub.add_parser("mapping", help="LIO-SAM mapping run")
    mp.add_argument("--dataset", required=True,
                    help="synthetic | synthetic-outdoor (labelled movers"
                         " -> dynamic_report.json with --dynamic) | "
                         "kitti:<dir> | mulran:<dir> | nclt:<dir>")
    mp.add_argument("--config", default=None)
    mp.add_argument("--output", default=None)
    mp.add_argument("--loop", action="store_true")
    mp.add_argument("--sync-backend", action="store_true",
                    help="optimize the pose graph inline instead of the "
                    "default async dispatch (AsyncBackend)")
    mp.add_argument("--gps", action="store_true",
                    help="enable GPS unary factors (synthetic: noisy "
                         "ground-truth fixes; mulran: global_pose.csv)")
    mp.add_argument("--gps-rate", type=float, default=1.0)
    mp.add_argument("--gps-noise", type=float, default=0.5)
    mp.add_argument("--state-log", action="store_true",
                    help="write per-scan state rows to pos_log.txt "
                         "(dump_lio_state_to_log analog)")
    mp.add_argument("--camera", action="store_true",
                    help="colorize keyframe clouds through the config's "
                         "camera: block (also on when the yaml sets "
                         "camera_en)")
    mp.add_argument("--camera-images", default=None,
                    help="directory of per-keyframe images "
                         "(%%06d.png/.jpg/.npy); default: deterministic "
                         "test pattern")
    mp.add_argument("--dynamic", action="store_true",
                    help="live dynamic-object removal (SCV-OD)")
    mp.add_argument("--dynamic-dump", default=None, metavar="DIR",
                    help="with --dynamic: write per-scan cluster-colored "
                         "clouds (%%06d_color.pcd) and removed dynamic "
                         "points (%%06d_removed.pcd) to DIR — the "
                         "saveColorCloud inspection analog (tgrs.cpp)")
    mp.add_argument("--sensor-height", type=float, default=None,
                    help="ground-segmentation mount height (default 0.4;"
                         " synthetic-outdoor --dynamic auto-selects its "
                         "2.0 m truck mount unless this flag is given)")
    mp.add_argument("--ssc-sensor-height", type=float, default=None,
                    help="decouple the SSC PD-gate height from the "
                         "ground-segmentation mount height (tall mounts)")
    mp.add_argument("--max-scans", type=int, default=0)
    mp.add_argument("--duration", type=float, default=8.0)
    mp.add_argument("--n-points", type=int, default=8000)
    mp.add_argument("--seed", type=int, default=0)
    mp.add_argument("--blind", type=float, default=1.0)
    mp.add_argument("--point-filter-num", type=int, default=1)
    mp.set_defaults(fn=cmd_mapping)

    ms = sub.add_parser("multi_session", help="two-session merge")
    ms.add_argument("--central", required=True)
    ms.add_argument("--query", required=True)
    ms.add_argument("--output", required=True)
    ms.set_defaults(fn=cmd_multi_session)

    orp = sub.add_parser("online_relo", help="online relocalization")
    orp.add_argument("--prior", required=True)
    orp.add_argument("--dataset", required=True)
    orp.add_argument("--config", default=None)
    orp.add_argument("--output", default=None)
    orp.add_argument("--max-scans", type=int, default=0)
    orp.add_argument("--duration", type=float, default=8.0)
    orp.add_argument("--n-points", type=int, default=8000)
    orp.add_argument("--seed", type=int, default=0)
    orp.add_argument("--blind", type=float, default=1.0)
    orp.add_argument("--point-filter-num", type=int, default=1)
    orp.set_defaults(fn=cmd_online_relo)

    ou = sub.add_parser("object_update", help="object-level map diff")
    ou.add_argument("--central", required=True)
    ou.add_argument("--query", required=True)
    ou.add_argument("--output", required=True)
    ou.set_defaults(fn=cmd_object_update)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
