"""Hot ops: on-device metrics (SSIM/PSNR) and Pallas TPU kernels.

ssim.py    — vmappable SSIM/PSNR/MSE in pure jnp (replaces the reference's
             CPU skimage per-frame loops, utils.py:220-301)
pallas/    — Pallas kernel variants of the hot compute paths
"""
