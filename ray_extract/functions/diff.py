"""Myers O(ND) sequence diff (greedy forward walk, no path recovery).

``difflib.SequenceMatcher`` is NOT an LCS algorithm — its recursive
longest-contiguous-block heuristic undercounts matches on inputs like
``aaaaaaaaaa`` vs the same with scattered substitutions (observed: mass 5
where the LCS is 7). The CDC diff operator needs the exact LCS mass, so
this module implements the real thing: Myers' minimal edit-script length
d (insertions + deletions), from which LCS = (n + m - d) / 2. Cost is
O((n+m)·d) — linear in how different the sequences are, not quadratic in
their length.
"""

from __future__ import annotations


def lcs_length(a: list, b: list) -> int:
    """Length of the longest common subsequence of ``a`` and ``b``
    (element equality), via Myers' greedy forward diagonal walk."""
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0
    max_d = n + m
    # v[k] = furthest x on diagonal k; offset indexing into a flat list
    v = [0] * (2 * max_d + 1)
    off = max_d
    for d in range(max_d + 1):
        for k in range(-d, d + 1, 2):
            if k == -d or (k != d and v[off + k - 1] < v[off + k + 1]):
                x = v[off + k + 1]
            else:
                x = v[off + k - 1] + 1
            y = x - k
            while x < n and y < m and a[x] == b[y]:
                x += 1
                y += 1
            v[off + k] = x
            if x >= n and y >= m:
                return (n + m - d) // 2
    raise AssertionError("unreachable: d is bounded by n + m")
