from .tools import load_config, from_dict, get_typed_config, deep_merge
from .common import (
    PipelineCfg,
    WandbCfg,
    DataLoaderCfg,
    OptimCfg,
    TrainingCfg,
    ValidationCfg,
    CheckpointCfg,
    get_typed_root_config,
)
