"""Ray Data stages: batch kernels and stateful actor-pool classes."""
