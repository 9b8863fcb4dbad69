from tpu3dsis.config.config import (
    Config,
    default_config,
    cfg_from_file,
    cfg_to_file,
    merge_into,
    load_label_mapping,
    finalize_config,
)

__all__ = [
    "Config",
    "default_config",
    "cfg_from_file",
    "cfg_to_file",
    "merge_into",
    "load_label_mapping",
    "finalize_config",
]
