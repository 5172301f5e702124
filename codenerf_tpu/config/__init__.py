from codenerf_tpu.config.schema import (
    Config,
    ExperimentConfig,
    DatasetConfig,
    ModelsConfig,
    ModelSpec,
    EmbeddingSpec,
    OptimizerConfig,
    NerfConfig,
    load_config,
    config_from_dict,
    dump_config,
)

__all__ = [
    "Config",
    "ExperimentConfig",
    "DatasetConfig",
    "ModelsConfig",
    "ModelSpec",
    "EmbeddingSpec",
    "OptimizerConfig",
    "NerfConfig",
    "load_config",
    "config_from_dict",
    "dump_config",
]
