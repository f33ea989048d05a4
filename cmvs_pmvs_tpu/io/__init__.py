from .cameras import (  # noqa: F401
    proj2q, projection_from_txt, q2proj, read_camera_txt,
    read_camera_txt_full, write_camera_txt,
)
from .visdata import read_vis, write_vis  # noqa: F401
from .ske import read_ske, write_ske  # noqa: F401
from .bundler import read_bundle  # noqa: F401
from .patches import (  # noqa: F401
    PatchRecord, read_patch_file, write_patch_file, read_pset, write_pset,
)
from .ply import write_patch_ply, read_ply_xyz  # noqa: F401
from .images import load_image, save_ppm, load_pgm_mask  # noqa: F401
