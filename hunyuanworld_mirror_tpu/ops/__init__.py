from . import interpolate
