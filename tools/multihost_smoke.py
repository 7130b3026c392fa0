"""Real 2-process jax.distributed smoke test (CPU backend).

Usage: launched twice by tools/run_multihost_smoke.sh with
JAX_PROCESS_ID=0/1.  Verifies cross-process collectives and the
pair-partitioned station graph (shard/multihost.py) end to end.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np

# jax.distributed must initialize BEFORE anything touches the XLA backend
# (importing the library is fine; jax.devices() is not) — same ordering a
# real pod launcher uses.
pid = int(os.environ["JAX_PROCESS_ID"])
jax.distributed.initialize(coordinator_address="localhost:40121",
                           num_processes=2, process_id=pid)

from ghicp_tpu.shard.multihost import register_graph_distributed

assert jax.process_count() == 2

# collective sanity: allgather across the two processes
import jax.numpy as jnp
from jax.experimental import multihost_utils
x = multihost_utils.process_allgather(jnp.float32(pid + 1))
assert float(x.sum()) == 3.0, x

# pair-partitioned station graph across the two processes
from ghicp_tpu.core.config import CorrespondenceType, FeatureType, GHICPConfig
from ghicp_tpu.io.synthetic import structured_scene

rng = np.random.default_rng(0)
pts = structured_scene(rng, 9000, extent=8.0)

def rigid(theta_deg, t):
    th = np.deg2rad(theta_deg)
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = [[np.cos(th), -np.sin(th), 0],
                 [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    T[:3, 3] = t
    return T

poses_gt = [rigid(0, [0, 0, 0]), rigid(6, [1.0, -0.5, 0.1]),
            rigid(12, [0.2, 0.7, -0.1])]
clouds = []
for T in poses_gt:
    Ri, ti = T[:3, :3], T[:3, 3]
    clouds.append(((pts - ti) @ Ri + rng.normal(0, 0.01, pts.shape))
                  .astype(np.float32))

cfg = GHICPConfig(feature=FeatureType.NONE,
                  correspondence=CorrespondenceType.NNR,
                  voxel_size=0.15, neighborhood_radius=0.5,
                  non_max_radius=1.0, min_neighbors=8,
                  estimated_overlap=0.9, max_iterations=40)
transforms, quals, poses = register_graph_distributed(
    clouds, [(1, 0), (2, 1)], cfg, keypoint_capacity=512)
for i in (1, 2):
    err = poses[i] @ np.linalg.inv(poses_gt[i])
    rot = np.degrees(np.arccos(np.clip((np.trace(err[:3, :3]) - 1) / 2,
                                       -1, 1)))
    tr = np.linalg.norm(err[:3, 3])
    assert rot < 2.0 and tr < 0.3, (i, rot, tr)
print(f"[process {pid}] MULTIHOST SMOKE OK (2 processes, station graph "
      f"errors < 2 deg / 0.3 m)")
