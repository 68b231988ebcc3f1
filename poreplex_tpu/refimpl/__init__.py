"""Trusted NumPy/f64 reference implementations of every numeric algorithm,
used as test oracles for the TPU kernels.

These are independent re-implementations of the behaviors documented in
SURVEY.md §3.2 (pomegranate Viterbi, scrappie event detection, the poly(A)
interval DP and the NN forwards), written directly from the algorithm
semantics — NOT used in the production path.
"""
