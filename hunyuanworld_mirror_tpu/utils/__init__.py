from . import rotation, camera, geometry, priors, sh, gs_act, grid
