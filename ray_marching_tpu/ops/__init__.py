"""Native kernel tier: Pallas (Mosaic) TPU kernels for the hot paths."""
