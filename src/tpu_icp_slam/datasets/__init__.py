from tpu_icp_slam.datasets import synthetic  # noqa: F401
