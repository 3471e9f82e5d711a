from tpu_icp_slam.icp.loop import ICPResult, align  # noqa: F401
from tpu_icp_slam.icp.point_to_point import umeyama_masked  # noqa: F401
