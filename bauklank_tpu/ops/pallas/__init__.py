"""Hand-fused Pallas TPU kernels for the hot spectral ops."""
