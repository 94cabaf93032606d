"""Offline evaluation: KITTI-protocol AP over BEV + 3D rotated IoU."""

from det3d_tpu.eval.ap import get_official_eval_result

__all__ = ["get_official_eval_result"]
