"""Ray Data stages: thin vectorized/actor wrappers over ..functions."""
