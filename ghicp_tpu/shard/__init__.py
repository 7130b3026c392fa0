from ghicp_tpu.shard.multihost import (init_distributed, partition_pairs,
                                       register_graph_distributed)
from ghicp_tpu.shard.spmd import AXIS, ghicp_register_sharded, make_mesh

__all__ = ["AXIS", "ghicp_register_sharded", "make_mesh",
           "init_distributed", "partition_pairs",
           "register_graph_distributed"]
