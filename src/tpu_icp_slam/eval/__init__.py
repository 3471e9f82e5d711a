from tpu_icp_slam.eval import golden, metrics  # noqa: F401
