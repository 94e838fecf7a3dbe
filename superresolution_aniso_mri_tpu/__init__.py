"""TPU-native anisotropic-MRI super-resolution framework.

A from-scratch JAX/Flax/XLA re-design of the capabilities of
qurAI-amsterdam/SuperResolution_aniso_MRI (AESR / CAISR): training 2D
convolutional autoencoders on MRI slices with a latent-interpolation
synthesis loss, and super-resolving anisotropic volumes in the
through-plane direction by encoding adjacent slices, lerping latents and
batch-decoding the in-between slices — all as jit-compiled XLA programs.

Layout conventions (TPU-first, differs from the torch reference):
  * images are NHWC (`[batch, height, width, channels]`),
  * volumes are `[slices, height, width]` float32 in [0, 1],
  * the (2B ∥ B) batch contract of the reference is preserved: a training
    batch carries `image` of shape [2B, H, W, C] (first half: from-slices,
    second half: to-slices) plus `slice_between` [B, H, W, C] and
    per-sample interpolation coefficients `alpha_from`/`alpha_to` [B, 1].
"""

__version__ = "0.1.0"
