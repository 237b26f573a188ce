"""dhaug_tpu — TPU-native (JAX/XLA/Pallas/pjit) rebuild of DH-AUG.

DH-AUG (ECCV 2022) is a forward-kinematics-driven data-augmentation framework for
2D->3D human pose estimation.  This package re-implements its full capability
surface — the Denavit-Hartenberg forward-kinematics skeleton model, the FK-GAN
(WGAN-GP) pose augmentor, the baseline pose-estimator zoo, and the H36M /
MPI-INF-3DHP evaluation stack — as an idiomatic JAX framework designed for TPU:

  * pure-functional, vmappable compute (no mutable module state),
  * single jitted train steps (GAN critic+generator, posenet),
  * `jax.sharding.Mesh` + `shard_map` data parallelism over ICI,
  * a fused Pallas kernel for the FK chain evaluation hot loop.

Layout:
  ops/       geometry, camera, DH forward kinematics, bone algebra, metrics
  models/    flax posenets (MLP / SemGCN / VideoPose / PoseFormer) + GAN nets
  data/      H36M dataset model, npz loaders, chunk samplers, synthetic fixtures
  gan/       WGAN-GP training steps and schedules
  train/     posenet train/eval loops, configs, runners
  parallel/  mesh construction, sharded train steps, bulk pose synthesis
  utils/     logging, checkpointing, schedulers

Reference (structure only, no code copied): hlz0606/DH-AUG, analysed in
/root/repo/SURVEY.md.
"""

__version__ = "0.1.0"
