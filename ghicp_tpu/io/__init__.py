from ghicp_tpu.io.files import (read_cloud, read_las, read_pcd, read_ply,
                                read_txt, write_cloud, write_las, write_pcd,
                                write_ply, write_txt)
from ghicp_tpu.io.synthetic import make_pair, structured_scene

__all__ = [
    "read_cloud", "read_las", "read_pcd", "read_ply", "read_txt",
    "write_cloud", "write_las", "write_pcd", "write_ply", "write_txt",
    "make_pair", "structured_scene",
]
