"""Pallas TPU kernels for the hot ops."""

from artist_tpu.kernels.splat_pallas import bilinear_splat_pallas

__all__ = ["bilinear_splat_pallas"]
