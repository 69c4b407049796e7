"""f32 covariance stability regression test.

The TPU runs pure f32; the reference's P <- L - K_x P covariance update
(esekfom.hpp:1931) loses positive-definiteness in f32 within a few scans
(prior/posterior variance ratios ~1e6 cancel catastrophically), which is
why update_iterated uses the Joseph form.  The x64-enabled in-process
test environment masks this class of bug, so this test runs the pipeline
in a subprocess with x64 disabled — the actual deployment configuration.
"""

import subprocess
import sys

SCRIPT = r"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from better_fastlio2_tpu.config import (LIOConfig, ShapesConfig,
                                        MappingConfig, IkdtreeConfig)
from better_fastlio2_tpu.io.synthetic import Trajectory, make_lio_sequence
from better_fastlio2_tpu.pipeline.lio import LIOPipeline

cfg = LIOConfig()
cfg.shapes = ShapesConfig(n_raw=8192, n_ds=4096, n_imu=32,
                          map_capacity_log2=16, map_bucket=4,
                          map_max_probe=8, knn_chunk=4096)
cfg.mapping = MappingConfig(det_range=60., cube_len=400., surf_leaf_size=0.4,
                            extrinsic_est_en=False)
cfg.ikdtree = IkdtreeConfig(max_iteration=3, filter_size_map_min=0.4)
groups = make_lio_sequence(duration=2.5, n_points=3000, seed=3, noise=0.004,
                           traj=Trajectory(t_still=1.0, speed=2.0))
pipe = LIOPipeline(cfg)
origin = np.array([0., 0., 1.5])
errs = []
for g in groups:
    out = pipe.process_scan(g["pts"], g["pt_t"], g["imu_acc"], g["imu_gyr"],
                            g["imu_t"], g["scan_beg_abs"], g["scan_end_t"])
    if out is not None:
        assert not np.any(np.isnan(out["pos"])), "NaN pose in f32 pipeline"
        errs.append(np.linalg.norm(out["pos"] - (g["gt_pos"] - origin)))
P = np.asarray(pipe.ls.P)
assert not np.any(np.isnan(P)), "NaN covariance"
eig = np.linalg.eigvalsh(P.astype(np.float64))
assert eig.min() > -1e-6, f"covariance indefinite: {eig.min()}"
ate = float(np.sqrt(np.mean(np.square(errs))))
assert ate < 0.15, f"f32 ATE too high: {ate}"
print("F32_OK", ate)
"""


def test_f32_pipeline_stable():
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True, text=True, timeout=900,
        cwd=__file__.rsplit("/", 2)[0],
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "F32_OK" in r.stdout, r.stdout
