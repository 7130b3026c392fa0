from ghicp_tpu.features.bsc import (BSCFeatures, extract_bsc, pack_bits,
                                    sample_pattern, unpack_bits,
                                    variant_permutations)
from ghicp_tpu.features.fpfh import fpfh_features, fpfh_similarity_matrix
from ghicp_tpu.features.rops import (RoPSFeatures, rops_features,
                                    rops_similarity_matrix)
from ghicp_tpu.features.hamming import (hamming_matrix_mxu,
                                        hamming_matrix_popcount,
                                        min_hamming_fd)

__all__ = [
    "BSCFeatures", "extract_bsc", "pack_bits", "sample_pattern",
    "unpack_bits", "variant_permutations", "fpfh_features",
    "fpfh_similarity_matrix", "hamming_matrix_mxu",
    "hamming_matrix_popcount", "min_hamming_fd",
    "RoPSFeatures", "rops_features", "rops_similarity_matrix",
]
