"""tpusr — a TPU-native (JAX/XLA/Pallas/pjit) super-resolution + defect-detection framework.

Re-designed from scratch with the capabilities of the reference study
`Super-Resolution-Images-for-3D-Printing-Defect-Detection` (see SURVEY.md):

- ``tpusr.core``     : resampling kernels, padding, patch extraction / overlap-add,
                       degradation model — the compute primitives, all jittable.
- ``tpusr.metrics``  : PSNR/SSIM (tf.image parity), error/edge/frequency metrics,
                       bootstrap CIs, summaries and ranking.
- ``tpusr.classic``  : the eight classic SR algorithms as compiled TPU functions.
- ``tpusr.models``   : flax SRCNN / EDSR / ESRGAN (G+D) / VGG16 classifier.
- ``tpusr.train``    : optax trainers (supervised + GAN), epoch trackers, checkpoints.
- ``tpusr.pipeline`` : fused LR -> SR -> defect-classification jit graph.
- ``tpusr.dist``     : device-mesh construction + data-parallel sharding helpers.
- ``tpusr.data``     : host-side dataset builders with reference-exact semantics.
- ``tpusr.viz``      : comparison/report panels.
"""

__version__ = "0.1.0"
