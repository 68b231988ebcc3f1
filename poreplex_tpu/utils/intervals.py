"""Interval arithmetic (role of poreplex/utils.py:28-39)."""


def union_intervals(intervals):
    """Merge overlapping or touching [begin, end] intervals; returns a new
    sorted list."""
    if not intervals:
        return []
    ordered = sorted([list(iv) for iv in intervals])
    merged = [ordered[0][:]]
    for begin, end in ordered[1:]:
        if begin <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], end)
        else:
            merged.append([begin, end])
    return merged
