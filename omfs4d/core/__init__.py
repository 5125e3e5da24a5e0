from omfs4d.core.config import (  # noqa: F401
    ClinicalConfig,
    Config,
    PipelineConfig,
    PredictConfig,
    RenderConfig,
    TrackConfig,
    TrainConfig,
    config_from_args,
)
from omfs4d.core.artifacts import (  # noqa: F401
    ArtifactStore,
    dataset_fingerprint,
    sha256_file,
    write_experiment_manifest,
)
from omfs4d.core.logging import EventLogger, get_logger, stage_timer  # noqa: F401
