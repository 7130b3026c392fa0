from ghicp_tpu.shard.spmd import AXIS, ghicp_register_sharded, make_mesh

__all__ = ["AXIS", "ghicp_register_sharded", "make_mesh"]
