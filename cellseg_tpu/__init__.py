"""cellseg_tpu — a TPU-native cell instance segmentation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the NeurIPS 2022
cell segmentation challenge baseline (JunMa11/NeurIPS-CellSeg): preprocessing,
3-class / distance-regression / flow-field models, sliding-window inference,
on-device instance decoding, and instance-level F1 evaluation.

Layer map (mirrors reference SURVEY.md §1, re-architected TPU-first):
  io/        host image IO (TIFF/PNG) and lazy tiled readers         (L0)
  pipeline/  on-device preprocessing, label generation, augmentation (L0/L1)
  models/    flax model zoo: UNet, UNETR2D, SwinUNETR-style, DUNet,
             flow-field head                                         (L2)
  train/     losses, optimizers, pjit train steps, checkpointing     (L3)
  infer/     tiled sliding-window inference engine                   (L4)
  decode/    on-device instance decoders (CC, watershed, flows)      (L4b)
  metrics/   instance F1 / Dice / CTC SEG-DET                        (L5)
  parallel/  device mesh setup and sharded execution                 (dist)
  cli/       argparse CLIs matching the reference's public ABI       (L6)
"""

__version__ = "0.1.0"
