"""TPU-native feed-forward 3D reconstruction engine (WorldMirror capabilities).

A brand-new JAX/XLA/Pallas/pjit framework replicating the capabilities of
HunyuanWorld-Mirror (reference: /root/reference): a feed-forward multi-view 3D
reconstruction model with a DINOv2-style ViT encoder, alternating frame/global
cross-view attention, multi-modal prior prompting, DPT prediction heads
(camera / point map / depth / normals / 3D Gaussians) and a TPU tile
rasterizer implemented in Pallas.

Layout:
  utils/     pure-math substrate (rotation, cameras, geometry, priors, SH, ...)
  models/    functional model components (param-pytree style, scan-friendly)
  ops/       compute kernels (resize, projection, tile rasterizer: JAX ref + Pallas)
  parallel/  mesh / sharding / collective programs for multi-chip scaling
  io/        image & video preprocessing, PLY/COLMAP exporters
  training/  losses, data pipeline, optimizer/ckpt glue
"""

__version__ = "0.1.0"

# Persistent XLA compile cache: TPU process startup through the axon relay
# costs ~12-15 min and every jit otherwise recompiles from scratch. Set via
# jax.config so it also binds when jax was imported first. Opt out with
# JAX_COMPILATION_CACHE_DIR="" (empty disables).
import os as _os

if _os.environ.get("JAX_COMPILATION_CACHE_DIR") != "":
    try:
        import jax as _jax

        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never let cache plumbing break imports
        pass
    del _jax
del _os
