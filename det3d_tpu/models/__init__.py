"""Model families. `pointpillars` is the flagship (and the reference's only
live family); the RPN/head components are reusable for variants."""

from det3d_tpu.models.pointpillars import PointPillars, PFN, RPN, SharedHead, scatter_to_bev

__all__ = ["PointPillars", "PFN", "RPN", "SharedHead", "scatter_to_bev"]
