from .texture import grab_tex, normalize_tex, ncc_dot, robustincc, unrobustincc  # noqa: F401
from .refine import (  # noqa: F401
    RefineProblem, encode_params, decode_params, compute_units,
    refine_patches, compute_weighted_incc, incc_objective,
)
