"""On-device ops: geometry, voxelization, BEV scatter, anchor masking, NMS,
rotated IoU. Every CUDA / numba kernel row of the reference's component
inventory has a vectorized-XLA or Pallas counterpart here."""
