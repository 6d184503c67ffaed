"""Pallas TPU kernels for ops XLA schedules poorly."""
