from .cameras import (  # noqa: F401
    CameraSet, build_camera_set, project, project_level, mult,
    depth_along_axis, get_unit, get_paxes, fundamental_matrix,
    epipolar_distance, triangulate_dlt, unproject, PROJ_SENTINEL,
)
