from omfs4d.render.rasterize import rasterize, render_avatar_frame  # noqa: F401
