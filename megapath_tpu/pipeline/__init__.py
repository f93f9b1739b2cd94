from megapath_tpu.pipeline.megapath import (  # noqa: F401
    MegaPathPipeline,
    PipelineConfig,
    PipelineResult,
)
