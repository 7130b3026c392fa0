"""Feature / registration persistence.

TPU equivalents of the reference's only persistence surfaces (SURVEY.md §5
"Checkpoint / resume"):

* :func:`save_features` / :func:`load_features` — binary feature dump/load
  (``StereoBinaryFeature::writeFeatures/readFeatures``,
  src/stereo_binary_feature.cpp:107-147) as a single ``.npz`` of the packed
  uint32 lanes + sampling-pattern seed, so a scan's BSC encoding is computed
  once and reused across pairs of a station graph.
* :func:`save_registration` / :func:`load_registration` — final transform +
  per-iteration metrics + config snapshot.  The reference restarts every
  run from scratch (SURVEY.md §5); reloading the transform into
  ``register_pair(initial_transform=...)`` resumes/refines instead.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import numpy as np

from ghicp_tpu.core.config import GHICPConfig
from ghicp_tpu.features.bsc import BSCFeatures


def save_features(path: str, feats: BSCFeatures, seed: int,
                  grid_side: int) -> None:
    np.savez_compressed(
        path, packed=np.asarray(feats.packed),
        mask=np.asarray(feats.mask), n_bits=feats.n_bits,
        seed=seed, grid_side=grid_side)


def load_features(path: str) -> Tuple[BSCFeatures, int, int]:
    import jax.numpy as jnp
    z = np.load(path)
    feats = BSCFeatures(packed=jnp.asarray(z["packed"]),
                        mask=jnp.asarray(z["mask"]),
                        n_bits=int(z["n_bits"]))
    return feats, int(z["seed"]), int(z["grid_side"])


def save_registration(path: str, transform: np.ndarray,
                      config: GHICPConfig,
                      metrics: Optional[dict] = None) -> None:
    cfg = {k: (v.value if hasattr(v, "value") else v)
           for k, v in dataclasses.asdict(config).items()}
    blob = {"transform": np.asarray(transform).tolist(), "config": cfg,
            "metrics": metrics or {}}
    with open(path, "w") as f:
        json.dump(blob, f, indent=1)


def load_registration(path: str):
    with open(path) as f:
        blob = json.load(f)
    return np.asarray(blob["transform"], np.float32), blob
