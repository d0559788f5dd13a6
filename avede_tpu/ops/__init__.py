"""Device ops: preprocessing, similarity/top-k, NMS, Pallas kernels,
host-side classical-CV features."""
