from . import images, ply, colmap
