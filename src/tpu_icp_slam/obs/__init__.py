from tpu_icp_slam.obs.metrics import MetricsLogger  # noqa: F401
from tpu_icp_slam.obs.timers import Timer, realize, timed  # noqa: F401
from tpu_icp_slam.obs import profile  # noqa: F401
