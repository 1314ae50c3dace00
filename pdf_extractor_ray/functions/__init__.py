"""Pure (non-Ray) extraction / normalization functions.

Everything in this package is deterministic, side-effect free and
individually unit-tested; the Ray stages in ``..stages`` are thin
vectorized wrappers around these.
"""
