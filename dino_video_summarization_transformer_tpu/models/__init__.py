from .timesformer import (
    TimeSformerConfig,
    aux_token_forward_features,
    flow_token_forward_features,
    init_aux_token_timesformer,
    init_flow_token_timesformer,
    config_from_cfg,
    forward,
    forward_features,
    init_timesformer,
    vit_base_config,
    vit_small_config,
    vit_tiny_config,
)
from .heads import (
    dino_head_forward,
    init_dino_head,
    init_linear_classifier,
    init_multi_dino_head,
    linear_classifier_forward,
    multi_dino_head_forward,
)
from . import convert, s3d, swin3d, vit2d

__all__ = [
    "TimeSformerConfig",
    "config_from_cfg",
    "forward",
    "forward_features",
    "init_timesformer",
    "vit_base_config",
    "vit_small_config",
    "vit_tiny_config",
    "dino_head_forward",
    "init_dino_head",
    "init_linear_classifier",
    "init_multi_dino_head",
    "linear_classifier_forward",
    "multi_dino_head_forward",
    "convert",
    "s3d",
    "swin3d",
    "vit2d",
]
