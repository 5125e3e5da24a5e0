from omfs4d.render.rasterize import (  # noqa: F401
    rasterize,
    render_avatar_frame,
    render_depth,
)
from omfs4d.render.mesh_raster import rasterize_mesh  # noqa: F401
