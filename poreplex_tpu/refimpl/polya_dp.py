"""NumPy oracle for the best poly(A)-interval dynamic program
(reference behavior: poreplex/polya.py:156-187).

Scores are integer-truncated exactly like the reference's assignment of
float scores into int64 matrices.
"""

import numpy as np


def find_best_polya_interval(is_polya, length, spike_weight=1.5,
                             spike_tolerance=110):
    """is_polya: [N] bool, length: [N] float.
    Returns (start, end) inclusive event indices, or None."""
    n = len(is_polya)
    if n == 0:
        return None
    # column scores, truncated toward zero on int assignment
    v = (is_polya.astype(np.int64) * 2 - 1) * np.asarray(length, float)
    col_match = np.array([x if x > 0 else x * spike_weight for x in v])
    col_match = col_match.astype(np.int64)  # trunc toward zero
    col_spike = np.where(is_polya, 1.0, -np.asarray(length, float))
    col_spike = col_spike.astype(np.int64)

    matching = np.zeros((n + 1, n + 1), np.int64)
    matching[0, 1:] = col_match
    spike = np.zeros((n + 1, n + 1), np.int64)
    spike[0, 1:] = col_spike

    for i in range(1, n + 1):
        for j in range(i, n + 1):
            matching[i, j] = matching[i, j - 1] + matching[0, j]
            if spike[i, j - 1] < 0:
                s = -1
            elif spike[0, j] > 0:
                s = spike_tolerance
            else:
                s = spike[i, j - 1] + spike[0, j]
            spike[i, j] = s

    final = matching[1:, 1:] * (spike[1:, 1:] > 0)
    start, end = np.unravel_index(final.argmax(), (n, n))
    if final[start, end] <= 0:
        return None
    return int(start), int(end)
