from ghicp_tpu.registration.estimator import (estimate, kabsch_6dof,
                                              similarity_2d_4p,
                                              similarity_3d_7p, yaw_4dof)
from ghicp_tpu.registration.ghicp import (GHICPResult, IterationMetrics,
                                          ghicp_register)
from ghicp_tpu.registration.pipeline import (RegistrationOutput,
                                             register_pair, transform_error)

__all__ = [
    "estimate", "kabsch_6dof", "similarity_2d_4p", "similarity_3d_7p",
    "yaw_4dof", "GHICPResult", "IterationMetrics", "ghicp_register",
    "RegistrationOutput", "register_pair", "transform_error",
]
