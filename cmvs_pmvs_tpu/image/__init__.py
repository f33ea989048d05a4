from .pyramid import PyramidSet, build_pyramids  # noqa: F401
from .sample import bilinear_color, mask_at, edge_at, mask_all  # noqa: F401
