from tpu_icp_slam.config.config import (  # noqa: F401
    BackendConfig,
    BenchConfig,
    DistConfig,
    ICPConfig,
    MappingConfig,
    PipelineConfig,
    SlamConfig,
    config_hash,
    from_json,
    override,
    to_json,
)
