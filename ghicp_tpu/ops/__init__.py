from ghicp_tpu.ops.eigh3 import eigh3

__all__ = ["eigh3"]
