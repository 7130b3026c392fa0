from ghicp_tpu.preprocess.voxel import voxel_downsample, voxel_keys
from ghicp_tpu.preprocess.neighbors import (HashGrid, NeighborList, build_grid,
                                            radius_neighbors)
from ghicp_tpu.preprocess.pca import PCAFeatures, pca_features, pca_from_neighbors
from ghicp_tpu.preprocess.keypoints import (KeypointResult, adaptive_detect,
                                            detect_keypoints,
                                            non_max_suppression,
                                            prune_unstable)

__all__ = [
    "voxel_downsample", "voxel_keys", "HashGrid", "NeighborList",
    "build_grid", "radius_neighbors", "PCAFeatures", "pca_features",
    "pca_from_neighbors", "KeypointResult", "adaptive_detect",
    "detect_keypoints", "non_max_suppression", "prune_unstable",
]
