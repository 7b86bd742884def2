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
from typing import Sequence

import numpy as np

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


def md5_bytes(b) -> str:
    """md5 hex of a bytes-like (feed zero-copy Arrow buffer slices)."""
    return hashlib.md5(b).hexdigest()


# ------------------------------------------------------- vectorized kernels
# The scalar forms above are the SPECIFICATION (and what the DuckDB oracles
# mirror); the batch forms below compute identical values with numpy — the
# per-character/per-token Python loops were the dominant cost of the dedup
# and fingerprint stages (hypothesis parity tests pin scalar == batch).

_POW_CACHE: dict[int, np.ndarray] = {}


def _pows(mult: int, n: int) -> np.ndarray:
    """[mult^0, mult^1, ..., mult^(n-1)] mod 2^31-1 (cached, grown on demand)."""
    cur = _POW_CACHE.get(mult)
    if cur is None or len(cur) < n:
        size = max(n, 1024, 0 if cur is None else 2 * len(cur))
        out = np.empty(size, dtype=np.int64)
        out[0] = 1
        start = 1
        if cur is not None:
            out[: len(cur)] = cur
            start = len(cur)
        for i in range(start, size):
            out[i] = (out[i - 1] * mult) % MOD31
        _POW_CACHE[mult] = out
        cur = out
    return cur


def _codes_segments(strs: Sequence[str]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenated UTF-32 codepoints + per-string (start, length) segments."""
    n = len(strs)
    lens = np.fromiter((len(s) for s in strs), dtype=np.int64, count=n)
    joined = "".join(strs)
    codes = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4").astype(np.int64)
    starts = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(lens[:-1], out=starts[1:])
    return codes, starts, lens


def _rolling31_segments(
    codes: np.ndarray, starts: np.ndarray, lens: np.ndarray, mult: int
) -> np.ndarray:
    """rolling31 of each segment: h_i = sum_j code_j * mult^(end_i-1-j) mod p.

    Every product is < 2^21 * 2^31 = 2^52 (int64-safe); terms are reduced mod
    p BEFORE the segment sum so sums of arbitrarily long documents stay exact.
    """
    n = len(starts)
    if codes.size == 0:
        return np.zeros(n, dtype=np.int64)
    ends = starts + lens
    exp = np.repeat(ends - 1, lens) - np.arange(codes.size, dtype=np.int64)
    terms = (codes * _pows(mult, int(lens.max()))[exp]) % MOD31
    # sentinel-extended reduceat: empty segments index the appended 0
    terms = np.append(terms, np.int64(0))
    sums = np.add.reduceat(terms, np.minimum(starts, terms.size - 1))
    sums[lens == 0] = 0
    return sums % MOD31


def rolling31_batch(strs: Sequence[str], mult: int) -> np.ndarray:
    """Vectorized ``rolling31`` over a batch of strings (int64 array)."""
    return _rolling31_segments(*_codes_segments(strs), mult)


def hash62_batch(strs: Sequence[str]) -> np.ndarray:
    """Vectorized ``hash62``: one codepoint pass, both multipliers."""
    codes, starts, lens = _codes_segments(strs)
    a = _rolling31_segments(codes, starts, lens, MULT_A)
    b = _rolling31_segments(codes, starts, lens, MULT_B)
    return a * (1 << 31) + b


def simhash32_batch(texts: Sequence[str]) -> np.ndarray:
    """Vectorized ``simhash32``: one flat token array for the whole batch,
    hash62 on the DISTINCT tokens only, then per-document per-bit vote sums
    via a single 2D segment reduction (tf weighting falls out of summing over
    occurrences)."""
    ndoc = len(texts)
    if ndoc == 0:
        return np.zeros(0, dtype=np.int64)
    tok_lists = [t.split(" ") for t in texts]
    counts = np.fromiter((len(tl) for tl in tok_lists), dtype=np.int64, count=ndoc)
    flat: list[str] = []
    for tl in tok_lists:
        flat.extend(tl)
    uniq, inv = np.unique(np.array(flat, dtype=object), return_inverse=True)
    h_occ = hash62_batch(list(uniq))[inv]
    signs = (((h_occ[:, None] >> np.arange(32, dtype=np.int64)) & 1) * 2 - 1)
    starts = np.zeros(ndoc, dtype=np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    # str.split(" ") never returns an empty list, so every segment is nonempty
    votes = np.add.reduceat(signs, starts, axis=0)
    return ((votes > 0) * (np.int64(1) << np.arange(32, dtype=np.int64))).sum(axis=1)


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


def word_shingles_batch(texts, k: int = 3):
    """Distinct k-word shingles for a whole batch of documents, vectorized.

    Output matches ``word_shingles`` doc by doc (same distinct shingle sets),
    but the kernel is all-Arrow/numpy: one split_pattern over the batch,
    k-gram assembly via take + binary_join_element_wise, per-doc dedup via
    dictionary_encode + np.unique on a packed (doc, code) key — zero Python
    string ops.

    Returns ``(doc_idx, shingles, n_sh)``: int64 numpy array of local doc
    indices (one row per DISTINCT shingle of that doc), a pa.StringArray of
    the shingles, and an int64 numpy array of length n_docs with each doc's
    distinct-shingle count (0 for docs shorter than k words).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(
        texts, type=pa.string()
    )
    arr = pc.cast(arr, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_docs = len(arr)
    empty = (
        np.array([], dtype=np.int64),
        pa.array([], type=pa.string()),
        np.zeros(n_docs, dtype=np.int64),
    )
    if n_docs == 0:
        return empty
    words = pc.split_pattern(arr, " ")
    offsets = words.offsets.to_numpy()
    flat = words.values
    cnt = np.diff(offsets)
    m = np.maximum(cnt - k + 1, 0)  # shingle starts per doc (with dups)
    total = int(m.sum())
    if total == 0:
        return empty
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), m)
    block_start = np.r_[0, np.cumsum(m)[:-1]]
    pos = (
        np.arange(total, dtype=np.int64)
        - np.repeat(block_start, m)
        + np.repeat(offsets[:-1].astype(np.int64), m)
    )
    parts = [pc.take(flat, pa.array(pos + j)) for j in range(k)]
    sh = parts[0] if k == 1 else pc.binary_join_element_wise(*parts, " ")
    # per-doc distinct: dictionary codes packed with the doc index
    enc = pc.dictionary_encode(sh)
    codes = enc.indices.to_numpy().astype(np.int64)
    vocab = enc.dictionary
    packed = doc_idx * np.int64(len(vocab)) + codes
    _, first = np.unique(packed, return_index=True)
    first.sort()  # keep within-doc first-occurrence order
    doc_u = doc_idx[first]
    n_sh = np.bincount(doc_u, minlength=n_docs).astype(np.int64)
    return doc_u, pc.take(vocab, pa.array(codes[first])), n_sh


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


def word_shingle_positions_batch(texts, k: int = 3):
    """ALL k-word shingle positions for a batch (multiplicity preserved —
    the coverage-metric counterpart of ``word_shingles_batch``'s distinct
    sets). Same all-Arrow kernel, minus the dedup pass.

    Returns ``(doc_idx, shingles)``: one row per shingle START position.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = texts if isinstance(texts, (pa.Array, pa.ChunkedArray)) else pa.array(
        texts, type=pa.string()
    )
    arr = pc.cast(arr, pa.string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n_docs = len(arr)
    if n_docs == 0:
        return np.array([], dtype=np.int64), pa.array([], type=pa.string())
    words = pc.split_pattern(arr, " ")
    offsets = words.offsets.to_numpy()
    flat = words.values
    cnt = np.diff(offsets)
    m = np.maximum(cnt - k + 1, 0)
    total = int(m.sum())
    if total == 0:
        return np.array([], dtype=np.int64), pa.array([], type=pa.string())
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), m)
    block_start = np.r_[0, np.cumsum(m)[:-1]]
    pos = (
        np.arange(total, dtype=np.int64)
        - np.repeat(block_start, m)
        + np.repeat(offsets[:-1].astype(np.int64), m)
    )
    parts = [pc.take(flat, pa.array(pos + j)) for j in range(k)]
    sh = parts[0] if k == 1 else pc.binary_join_element_wise(*parts, " ")
    return doc_idx, sh
