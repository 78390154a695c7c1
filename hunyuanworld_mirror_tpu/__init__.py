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
