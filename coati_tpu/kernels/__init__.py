"""Pallas TPU kernels for the hot DP paths."""
