"""Deterministic language identification and document-language aggregation.

Replaces the reference's seeded ``langdetect`` call
(`experimental_base.py:135-160`, ``DetectorFactory.seed = 0``) with a
marker-word n-gram heuristic that is fully deterministic and cheap enough to
run vectorized over millions of documents. The aggregation semantics
(`set_document_languages_from_text_blocks`, `experimental_base.py:162-192`)
are preserved exactly: languages with block proportion STRICTLY greater than
``min_language_proportion`` (default 0.4); all-None block languages -> None.

Every rule is expressible in SQL (regexp marker counts) so pipelines using it
keep a DuckDB oracle.
"""

from __future__ import annotations

from collections import Counter
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..vocab import MIN_LANGUAGE_PROPORTION

# Ordered: ties break toward the earlier language; all-zero scores -> "en".
MARKER_WORDS: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "and", "of", "to", "is", "a")),
    ("de", ("der", "die", "und", "ist", "das", "nicht", "ein")),
    ("fr", ("le", "les", "et", "est", "une", "dans", "que")),
    ("es", ("el", "los", "las", "es", "una", "por", "con")),
]
CJK_PATTERN = "[一-鿿]"


def marker_pattern(words: Sequence[str]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def detect_language(text: str) -> str:
    """Single-string language id (the A1 analogue for one document).

    Compiled with ``re.ASCII`` so ``\\b`` means the ASCII word boundary —
    matching RE2 semantics (pyarrow's ``count_substring_regex`` and DuckDB's
    ``regexp_extract_all``), which is what the pipeline and the SQL oracle
    use. Without it, marker words abutting accented letters ("theé") score
    differently here than in the pipeline.
    """
    import re

    if re.search(CJK_PATTERN, text):
        return "zh"
    best_lang, best = "en", -1
    for lang, words in MARKER_WORDS:
        score = len(re.findall(marker_pattern(words), text, flags=re.ASCII))
        if score > best:
            best_lang, best = lang, score
    return best_lang


def detect_languages_arrow(texts: pa.Array) -> np.ndarray:
    """Vectorized language id over an arrow string array -> numpy object array."""
    n = len(texts)
    scores = np.zeros((n, len(MARKER_WORDS)), dtype=np.int64)
    for j, (_lang, words) in enumerate(MARKER_WORDS):
        scores[:, j] = pc.count_substring_regex(texts, marker_pattern(words)).to_numpy(
            zero_copy_only=False
        )
    # ties break toward the earlier language; all-zero -> index 0 ("en")
    winner = np.argmax(scores, axis=1)
    langs = np.array([lang for lang, _ in MARKER_WORDS], dtype=object)[winner]
    cjk = pc.count_substring_regex(texts, CJK_PATTERN).to_numpy(zero_copy_only=False) > 0
    langs[cjk] = "zh"
    return langs


def document_languages(
    block_languages: Sequence[Optional[str]],
    min_language_proportion: float = MIN_LANGUAGE_PROPORTION,
) -> Optional[list[str]]:
    """Reference `set_document_languages_from_text_blocks` semantics
    (`experimental_base.py:162-192`): proportion strictly > threshold over ALL
    blocks (None languages count in the denominator); all-None -> None.
    """
    if all(lang is None for lang in block_languages):
        return None
    counts = Counter(lang for lang in block_languages if lang is not None)
    total = len(block_languages)
    return [lang for lang, c in counts.items() if c / total > min_language_proportion]


def join_block_texts(texts: Sequence[str]) -> str:
    """Reference ParserOutput.to_string (`experimental_base.py:128-133`):
    blocks joined by a single space, each block's text stripped."""
    return " ".join(t.strip() for t in texts)
