from .diffusion_net import (
    DiffusionNet,
    DiffusionNetBlock,
    LearnedTimeDiffusion,
    SpatialGradientFeatures,
    MiniMLP,
)
