"""gaussian_gan_decoder_tpu — TPU-native (JAX/XLA/Pallas) rebuild of
fraunhoferhhi/gaussian_gan_decoder.

A framework that distills pretrained 3D-aware GANs (EG3D tri-planes /
PanoHead tri-grids) into explicit 3D Gaussian Splatting scenes, rendered
with a TPU-native differentiable splatting rasterizer.

Layer map (mirrors the reference, re-designed TPU-first):
  ops/         XLA/Pallas numerics: upfirdn2d, bias_act, modulated conv,
               grid-sample, filtered lrelu, knn                  (ref L0)
  models/      StyleGAN2 backbone, superresolution, tri-plane generator,
               decoder heads, VGG16-LPIPS, IR-SE50               (ref L1/L2/L4)
  neuralfield/ ray sampling, importance volume rendering         (ref L2)
  splat/       differentiable 3DGS rasterizer (project/bin/sort/blend)
                                                                 (ref L3/N1)
  gaussians/   GaussianModel pytree, cameras, SH, PLY IO         (ref L3)
  decoder/     target-data pipeline, camera samplers             (ref L4)
  losses/      L1/L2/SSIM/Sobel/LPIPS/ID                         (ref L4)
  train/       distillation loop, eval, checkpoints              (ref L5)
  parallel/    meshes, shardings, collectives
  apps/        CLI entry points                                  (ref L5)
"""

__version__ = "0.1.0"
