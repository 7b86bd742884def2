"""Deterministic hashing primitives shared by dedup / fingerprint pipelines.

Every hash here is reproducible in ANSI SQL (DuckDB) so the corresponding
pipelines keep exact oracles:

- ``rolling31`` / ``hash62``: polynomial rolling hash over character codes,
  modulus 2^31-1 (keeps every intermediate product < 2^51, safe in int64 on
  both sides). hash62 combines two multipliers into a 62-bit value.
- ``md5_str``: hex md5 (DuckDB ``md5()``); minhash signatures compare md5 hex
  strings lexicographically, which is identical in Python and SQL.
"""

from __future__ import annotations

import hashlib

MOD31 = (1 << 31) - 1
MULT_A = 1000003
MULT_B = 999983


def rolling31(s: str, mult: int) -> int:
    h = 0
    for ch in s:
        h = (h * mult + ord(ch)) % MOD31
    return h


def hash62(s: str) -> int:
    return rolling31(s, MULT_A) * (1 << 31) + rolling31(s, MULT_B)


def md5_str(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def simhash32(text: str) -> int:
    """32-bit simhash over whitespace tokens weighted by term frequency.

    Bit k of the signature is set when the tf-weighted majority of token-hash
    bits k is positive (strictly greater than zero).
    """
    counts: dict[str, int] = {}
    for w in text.split(" "):
        counts[w] = counts.get(w, 0) + 1
    votes = [0] * 32
    for w, c in counts.items():
        h = hash62(w)
        for k in range(32):
            votes[k] += c if (h >> k) & 1 else -c
    sig = 0
    for k in range(32):
        if votes[k] > 0:
            sig |= 1 << k
    return sig


def word_shingles(text: str, k: int = 3) -> set[str]:
    """Distinct k-word shingles (space-joined)."""
    ws = text.split(" ")
    return {" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)}


def minhash_signature(shingles: set[str], num_perm: int = 16) -> list[str]:
    """num_perm md5-based min-hashes, compared as lowercase hex STRINGS
    (lexicographic min == DuckDB ``min(md5(...))``)."""
    return [
        min(md5_str(f"{j}:{s}") for s in shingles) if shingles else ""
        for j in range(num_perm)
    ]


def lsh_bands(sig: list[str], band_rows: int = 4) -> list[str]:
    """Band signatures: md5 of the '|'-joined row hashes of each band."""
    return [
        md5_str("|".join(sig[b : b + band_rows]))
        for b in range(0, len(sig), band_rows)
    ]
