"""Measure the CPU reference-equivalent baseline (native/src/ref_frontend.cc)
on the EXACT synthetic workload bench.py runs, grounding vs_baseline.

The reference repo publishes no numbers (BASELINE.md), so the baseline
denominator is produced by running a faithful C++ re-implementation of
the reference front end's math (double precision, OpenMP over points —
see ref_frontend.cc header) on the same 30k-point/scan sequence.

Usage:  python tools/bench_cpu_ref.py [--threads N] [--scans N]
Prints the C++ program's JSON line (scans/s + per-stage ms) per thread
count and a trajectory sanity check against the ground truth.
"""

from __future__ import annotations

import argparse
import json
import os
import struct
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(REPO, "native", "src", "ref_frontend.cc")
BIN = os.path.join(REPO, "native", "ref_frontend")


def build():
    if (os.path.exists(BIN)
            and os.path.getmtime(BIN) >= os.path.getmtime(SRC)):
        return
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-fopenmp",
           "-o", BIN, SRC]
    print("+ " + " ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)


def dump_sequence(path: str, n_scans: int, workload: str = "room"):
    sys.path.insert(0, REPO)
    from better_fastlio2_tpu.io.synthetic import make_bench_sequence

    # identical to bench.py's workload (shared factory)
    groups = make_bench_sequence(workload, n_scans)
    with open(path, "wb") as f:
        f.write(struct.pack("<i", len(groups)))
        for g in groups:
            pts = np.asarray(g["pts"], np.float32)
            pt_t = np.asarray(g["pt_t"], np.float32)
            f.write(struct.pack("<i", len(pts)))
            f.write(pts.tobytes())
            f.write(pt_t.tobytes())
            acc = np.asarray(g["imu_acc"], np.float32)
            gyr = np.asarray(g["imu_gyr"], np.float32)
            imu_t = np.asarray(g["imu_t"], np.float32)
            f.write(struct.pack("<i", len(acc)))
            f.write(acc.tobytes())
            f.write(gyr.tobytes())
            f.write(imu_t.tobytes())
            f.write(struct.pack("<f", float(g["scan_end_t"])))
    return groups


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=0,
                    help="0 = run both 1 thread and all cores")
    ap.add_argument("--scans", type=int, default=120)
    ap.add_argument("--workload", default="room",
                    help="room | outdoor (io.synthetic.make_bench_sequence)")
    args = ap.parse_args()

    build()
    dump = "/tmp/bench_cpu_ref_dump.bin"
    groups = dump_sequence(dump, args.scans, args.workload)
    # odometry starts at the world origin; ground truth starts at the
    # trajectory's initial position (x=y=0, z=height) — compare
    # displacements from the start
    gt_end = np.asarray(groups[-1]["gt_pos"], float).copy()
    gt_end[2] -= groups[0]["gt_pos"][2]

    thread_sets = [args.threads] if args.threads else [1, os.cpu_count()]
    results = []
    for nt in thread_sets:
        out = subprocess.run([BIN, dump, str(nt)], capture_output=True,
                             text=True, check=True).stdout.strip()
        print(out)
        r = json.loads(out)
        end = np.array(r["end_pos"])
        err = float(np.linalg.norm(end - gt_end))
        print(f"  # end-pos error vs ground truth: {err:.3f} m "
              f"(gt {np.round(gt_end, 3).tolist()})", file=sys.stderr)
        r["end_err_m"] = err
        results.append(r)
    return results


if __name__ == "__main__":
    main()
