from ghicp_tpu.matching.auction import AuctionResult, auction_match
from ghicp_tpu.matching.cost import (CostResult, blend_bsc, blend_fpfh,
                                     blend_none, euclidean_matrix)
from ghicp_tpu.matching.matchers import MatchResult, nn_match, nnr_match

__all__ = [
    "AuctionResult", "auction_match", "CostResult", "blend_bsc",
    "blend_fpfh", "blend_none", "euclidean_matrix", "MatchResult",
    "nn_match", "nnr_match",
]
