"""brief_pytorch_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
compressing biomedical volumes by overfitting implicit neural functions,
with the full capability surface of BRIEF_PyTorch re-designed TPU-first.

Subpackages
  core/       coordinates, normalisation, config system
  models/     φ-network zoo (init/apply pytrees) + closed-form sizing
  ops/        Pallas TPU kernels (fused SIREN forward/backward, grid decode)
  train/      jitted fit loop, samplers, losses, optimisers
  parallel/   device mesh, vmapped block-batched training, shard_map
  partition/  volume dividers, octree/quadtree + exact DP block selection
  io/         TIFF/PNG/MP4 I/O, raw-binary weight interchange, archives
  eval/       PSNR/SSIM/MIP metrics, performance reports
  post/       deblocking filter (JAX + native C++ tool), denoise/clip
  sched/      in-process task fleet + experiment-grid expansion
  nflr/       latent-modulated SIREN with learned entropy coding
  cli/        command-line entry points accepting the reference YAML schema
"""

__version__ = "0.1.0"
