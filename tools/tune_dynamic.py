"""Offline threshold sweep for the appearance-mode dynamic-removal
decision (perception.dynamic.appearance_dynamic_mask).

A labelled synthetic-outdoor run with LIO_DYN_TUNE_DUMP=<dir> dumps each
scored scan's decision inputs (world keys, scored/band masks, cluster
labels, old-frame key union).  This tool replays the decision over a
threshold grid against the regenerated ground-truth labels — seconds per
candidate instead of a full pipeline run each.  The replay is faithful
up to odometry feedback (removed points influence later poses); confirm
the chosen point with one full `run.py mapping --dataset
synthetic-outdoor --dynamic` run.

Usage:
  LIO_DYN_TUNE_DUMP=/tmp/dyn_dump python -m better_fastlio2_tpu.run \
      mapping --dataset synthetic-outdoor --dynamic
  python tools/tune_dynamic.py /tmp/dyn_dump
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(dump_dir: str):
    import numpy as np

    from better_fastlio2_tpu.io.synthetic import (OutdoorWorld, Trajectory,
                                                  make_lio_sequence)
    from better_fastlio2_tpu.perception import dynamic as dyn

    groups = list(make_lio_sequence(
        duration=8.0, n_points=8000, seed=0,
        traj=Trajectory(t_still=1.0, speed=2.0, height=2.0),
        world=OutdoorWorld(seed=0), labels=True,
    ))

    files = sorted(glob.glob(os.path.join(dump_dir, "scan_*.npz")))
    if not files:
        raise SystemExit(f"no scan_*.npz dumps in {dump_dir}")
    scans = []
    for f in files:
        # scan_{N:05d}.npz carries the 0-based dynamic-branch call
        # counter == group index (see pipeline/slam.py dump site)
        gi = int(re.search(r"scan_(\d+)\.npz$", f).group(1))
        d = np.load(f)
        scans.append((gi, d["keys"], d["scored"], d["band"], d["lab_pt"],
                      d["old_sorted"], groups[gi]["gt_dynamic"],
                      d["d_now"] if "d_now" in d else None,
                      d["d_old"] if "d_old" in d else None))
    print(f"# {len(scans)} dumped scans, groups {scans[0][0]}..{scans[-1][0]}")

    # recall-ceiling diagnosis: where do the GT-positive misses live?
    if scans[0][7] is not None:
        tot = in_band = clustered = 0
        r_hist = []
        for _, _, _, band, lab, _, gt, dn, _ in scans:
            tot += int(gt.sum())
            in_band += int((gt & band).sum())
            clustered += int((gt & band & (lab >= 0)).sum())
            r_hist.append(dn[gt & band & (lab >= 0)])
        r_all = np.concatenate(r_hist)
        print(f"# gt+ points {tot}; in z-band {in_band/tot:.2f}; "
              f"clustered {clustered/tot:.2f}; of those, within 28 m of "
              f"the sensor: {float((r_all <= 28).mean()):.2f} "
              f"(achievable-recall cap at the default gate)")

    def score(ts, tw, mc, msf, r=None):
        tp = fp = fn = 0
        for _, keys, scored, band, lab_pt, old_sorted, gt, dn, do_ in scans:
            if r is not None and dn is not None:
                scored = band & (lab_pt >= 0) & (dn <= r) & (do_ <= r)
            pred = dyn.appearance_dynamic_mask(
                keys, scored, band, lab_pt, old_sorted,
                thr_strong=ts, thr_weak=tw, min_cnt=mc,
                min_scored_frac=msf)
            tp += int(np.sum(pred & gt))
            fp += int(np.sum(pred & ~gt))
            fn += int(np.sum(~pred & gt))
        pr = tp / max(tp + fp, 1)
        rr = tp / max(tp + fn, 1)
        f1 = 2 * pr * rr / max(pr + rr, 1e-12)
        return pr, rr, f1

    from better_fastlio2_tpu.config import LIOConfig

    _c = LIOConfig()
    base = score(_c.dyn_appear_thr_strong, _c.dyn_appear_thr_weak,
                 _c.dyn_appear_min_cnt, _c.dyn_appear_min_scored_frac)
    print(f"# replayed config defaults: P {base[0]:.3f} R {base[1]:.3f} "
          f"F1 {base[2]:.3f}")

    rows = []
    for ts in (0.35, 0.45, 0.5, 0.55, 0.6):
        for tw in (0.0, 0.7, 0.8, 0.9, 0.95):
            if tw and tw <= ts:
                continue
            for mc in (4, 8, 12):
                for msf in (0.5, 0.6, 0.7):
                    pr, rr, f1 = score(ts, tw, mc, msf)
                    rows.append({"thr_strong": ts, "thr_weak": tw,
                                 "min_cnt": mc, "min_scored_frac": msf,
                                 "precision": round(pr, 4),
                                 "recall": round(rr, 4),
                                 "f1": round(f1, 4)})
    rows.sort(key=lambda r: r["f1"], reverse=True)
    print("# top-10 by F1:")
    for r in rows[:10]:
        print(json.dumps(r))
    hi_p = [r for r in rows if r["precision"] >= 0.9]
    print("# top-10 by F1 with precision >= 0.9:")
    for r in hi_p[:10]:
        print(json.dumps(r))

    # range-gate sweep (needs d_now/d_old in the dumps): precision
    # collapses as the gate opens past ~28 m — the old frames'
    # occupancy is too sparse out there to distinguish "mover was not
    # here" from "never sampled" (ROUND5.md round-5 addendum)
    if scans[0][7] is not None:
        print("# dual range-gate sweep (thr_strong=0.6, weak off, msf=0.6):")
        for r in (28.0, 30.0, 32.0, 36.0, 40.0):
            pr, rr, f1 = score(0.6, 0.0, 4, 0.6, r=r)
            print(json.dumps({"r_max": r, "precision": round(pr, 4),
                              "recall": round(rr, 4), "f1": round(f1, 4)}))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/dyn_dump")
