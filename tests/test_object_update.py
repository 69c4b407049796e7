"""Object-level map update test: two sessions of one scene where an
object persists, one disappears, and one appears — the diff must label
them fused/old/new (object_update.cpp behavior)."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from better_fastlio2_tpu.apps.object_update import (
    ObjectUpdateConfig,
    ObjectUpdater,
)
from better_fastlio2_tpu.io.session import SessionWriter
from better_fastlio2_tpu.ops import scancontext as sc
from better_fastlio2_tpu.utils import se3
from test_multisession import yaw_pose


def scene(rng, objects, n_ground=6000, h=0.4):
    """Ground + pedestrian-sized boxes at given (x, y) centers."""
    g = np.stack(
        [rng.uniform(-20, 20, n_ground), rng.uniform(-20, 20, n_ground),
         -h + rng.normal(scale=0.01, size=n_ground)], 1
    )
    parts = [g]
    for (cx, cy) in objects:
        parts.append(
            np.stack(
                [rng.uniform(cx - 0.3, cx + 0.3, 400),
                 rng.uniform(cy - 0.3, cy + 0.3, 400),
                 rng.uniform(-h + 0.05, 0.30, 400)], 1
            )
        )
    return np.concatenate(parts).astype(np.float32)


def write_one_kf_session(root, cloud, pose):
    w = SessionWriter(root=root)
    desc = np.asarray(
        sc.make_descriptor(jnp.asarray(cloud, jnp.float32),
                           jnp.ones(len(cloud), bool))
    )
    w.add_keyframe(cloud, np.zeros(len(cloud)), desc, pose)
    w.save()


def test_object_diff(rng):
    pose = yaw_pose(0.0, [0, 0, 0])
    # central: objects at A(4,3) [persists] and B(-5,2) [disappears]
    central_cloud = scene(rng, [(4, 3), (-5, 2)])
    # query: A persists, C(6,-4) appears
    query_cloud = scene(rng, [(4, 3), (6, -4)])

    with tempfile.TemporaryDirectory() as td:
        cdir, qdir = os.path.join(td, "c"), os.path.join(td, "q")
        write_one_kf_session(cdir, central_cloud, pose)
        write_one_kf_session(qdir, query_cloud, pose)

        upd = ObjectUpdater(cdir, qdir,
                            ObjectUpdateConfig(sensor_height=0.4))
        res = upd.run()
        assert res["n_central_objects"] >= 2, res
        assert res["n_query_objects"] >= 2, res
        assert len(res["fused"]) >= 1, "persisting object not fused"
        assert len(res["new"]) >= 1, "appearing object not detected"
        assert len(res["old"]) >= 1, "disappearing object not detected"

        # category locations sanity
        new_c = np.concatenate(res["new"]).mean(0)
        assert np.linalg.norm(new_c[:2] - [6, -4]) < 1.5
        old_c = np.concatenate(res["old"]).mean(0)
        assert np.linalg.norm(old_c[:2] - [-5, 2]) < 1.5

        out = os.path.join(td, "out")
        upd.write_outputs(res, out)
        assert os.path.exists(os.path.join(out, "objects_fused.pcd"))
