from tpu_icp_slam.mapping import normals, occupancy2d  # noqa: F401
