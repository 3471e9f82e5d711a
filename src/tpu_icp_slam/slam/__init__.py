from tpu_icp_slam.slam.pipeline import OdometryPipeline, OdomState  # noqa: F401
