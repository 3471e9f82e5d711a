from tpu_icp_slam.kernels.nn import nearest_neighbor  # noqa: F401
