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
#
# The cache dir is keyed by a host fingerprint (machine + CPU feature set):
# XLA:CPU persists AOT-compiled code specialized to the build host's CPU
# features, and loading it on a different machine warns "could lead to
# execution errors such as SIGILL" (observed in MULTICHIP_r02). A per-host
# dir makes stale cross-machine AOT results unreachable.
import os as _os


def _cache_dir() -> str:
    explicit = _os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if explicit:
        return explicit
    import hashlib
    import platform
    fp = platform.machine() + ";" + platform.processor()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    fp += ";" + line
                    break
    except OSError:
        pass
    return "/tmp/jax_cache_" + hashlib.sha1(fp.encode()).hexdigest()[:10]


# CPU-only runs (tests, multichip dryruns: JAX_PLATFORMS=cpu) skip the cache
# entirely: XLA:CPU persists AOT machine code whose "+prefer-no-*" pseudo
# features never match the host's reported feature set, so every load warns
# "could lead to execution errors such as SIGILL" and recompiles anyway. The
# cache exists for the TPU path (axon startup ~12-15 min), not CPU.
if (_os.environ.get("JAX_COMPILATION_CACHE_DIR") != ""
        and _os.environ.get("JAX_PLATFORMS", "").strip().lower() != "cpu"):
    try:
        import jax as _jax

        _jax.config.update("jax_compilation_cache_dir", _cache_dir())
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        del _jax
    except Exception:  # never let cache plumbing break imports
        pass
del _os
