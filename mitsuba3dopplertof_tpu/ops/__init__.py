"""TPU kernels (Pallas) and native host helpers."""
