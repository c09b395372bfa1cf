"""Pallas TPU kernels for the geodesic hot loop."""
