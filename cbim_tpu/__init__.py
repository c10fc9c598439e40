"""CBIM-TPU: a TPU-native medical image segmentation framework.

A from-scratch JAX / XLA / Pallas / GSPMD re-design of the capabilities of
yhygao/CBIM-Medical-Image-Segmentation (the reference, pure PyTorch):

- config-driven CLI (same YAML schema, `config/<dataset>/<model>_<dim>.yaml`)
- in-memory volumetric datasets with *on-device, batched* augmentation
- a 2D + 3D model zoo (CNN + Transformer) written in Flax with
  channels-last layouts and bf16-friendly compute
- CE + adaptive Dice training with EMA, k-fold cross validation
- jit-compiled sliding-window inference with the reference's exact
  window-fusion semantics
- Dice / HD95 / ASD evaluation
- GSPMD data parallelism over a `jax.sharding.Mesh` (the TPU-native
  equivalent of the reference's DDP/NCCL path, train_ddp.py)

Layout convention: arrays are channels-last, i.e. (B, D, H, W, C) for 3D and
(B, H, W, C) for 2D; labels are integer arrays without a channel axis.
"""

__version__ = "0.1.0"
