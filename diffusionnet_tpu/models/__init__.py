from .diffusion_net import (
    DiffusionNet,
    DiffusionNetBlock,
    LearnedTimeDiffusion,
    SpatialGradientFeatures,
    MiniMLP,
)

from . import fmaps  # noqa: F401,E402
from . import fast_path  # noqa: F401,E402
from .fmaps import FunctionalMapCorrespondence, compute_fmap  # noqa: F401,E402
