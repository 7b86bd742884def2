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


# ---------------------------------------------------------------------------
# Wide detector (opt-in): script-range classification + a larger marker table.
#
# The reference's langdetect covers ~55 languages (experimental_base.py:152).
# The default detector above trades breadth for SQL-oracle determinism; this
# one widens coverage to ~34 languages while staying deterministic and fully
# vectorized (one RE2 pass per script/language over the whole batch). It is
# NOT SQL-oracle-checked — swap it in via ExtractConfig.language_detector.
#
# Rules, in order:
#   1. Count characters per non-Latin script range. If the densest script
#      outweighs Latin letters, classify by script (with sub-rules: any kana
#      -> ja over zh; Ukrainian-specific letters -> uk over ru; Persian
#      letters -> fa over ar).
#   2. Otherwise score the Latin-script marker table (ASCII-only marker
#      words, since RE2's \b is an ASCII word boundary); ties break toward
#      the earlier entry; all-zero -> "en".
# ---------------------------------------------------------------------------

SCRIPT_RANGES: list[tuple[str, str]] = [
    ("zh", "[一-鿿]"),      # Han
    ("ja", "[぀-ヿ]"),      # Hiragana + Katakana
    ("ko", "[가-힯]"),      # Hangul
    ("ru", "[Ѐ-ӿ]"),      # Cyrillic
    ("el", "[Ͱ-Ͽ]"),
    ("ar", "[؀-ۿ]"),
    ("he", "[֐-׿]"),
    ("hi", "[ऀ-ॿ]"),      # Devanagari
    ("bn", "[ঀ-৿]"),
    ("ta", "[஀-௿]"),
    ("te", "[ఀ-౿]"),
    ("th", "[฀-๿]"),
    ("ka", "[Ⴀ-ჿ]"),
    ("hy", "[԰-֏]"),
]

WIDE_MARKERS: list[tuple[str, tuple[str, ...]]] = [
    ("en", ("the", "and", "of", "is", "that", "this", "with")),
    ("de", ("der", "die", "und", "nicht", "das", "ein", "ist", "auch")),
    ("fr", ("les", "des", "est", "dans", "que", "pour", "avec", "sont")),
    ("es", ("los", "las", "una", "por", "con", "para", "como", "pero")),
    ("it", ("che", "della", "sono", "questo", "anche", "nel", "gli")),
    ("pt", ("uma", "isso", "mais", "quando", "muito", "pelo", "dos")),
    ("nl", ("het", "een", "van", "niet", "zijn", "voor", "maar", "ook")),
    ("sv", ("och", "att", "som", "inte", "med", "har", "den", "hon")),
    ("da", ("og", "det", "ikke", "til", "med", "han", "hun", "havde")),
    ("no", ("og", "ikke", "som", "til", "han", "var", "paa", "seg")),
    ("fi", ("ja", "on", "ei", "se", "mutta", "kun", "hyvin", "ovat")),
    ("pl", ("nie", "jest", "czy", "ale", "tylko", "przez", "bardzo")),
    ("cs", ("je", "se", "na", "to", "ale", "jako", "jsem", "jsou")),
    ("ro", ("este", "pentru", "care", "sunt", "din", "mai", "dar")),
    ("hu", ("az", "egy", "nem", "hogy", "van", "is", "csak", "meg")),
    ("tr", ("bir", "ve", "bu", "gibi", "daha", "sonra", "kadar")),
    ("id", ("yang", "dan", "untuk", "dengan", "ini", "tidak", "dari")),
    ("vi", ("khong", "nguoi", "cua", "trong", "nhung", "duoc")),
    ("ca", ("els", "amb", "per", "que", "dels", "aquest", "com")),
    ("hr", ("je", "se", "na", "za", "da", "kako", "ali", "samo")),
]
_UK_LETTERS = "[іїєґІЇЄҐ]"
_FA_LETTERS = "[پچژگ]"
_KANA = "[぀-ヿ]"


def detect_languages_arrow_wide(texts: pa.Array) -> np.ndarray:
    """Vectorized wide-coverage language id; same contract as
    ``detect_languages_arrow`` (arrow string array -> numpy object array)."""
    n = len(texts)

    def counts(pattern: str) -> np.ndarray:
        return pc.count_substring_regex(texts, pattern).to_numpy(
            zero_copy_only=False
        )

    script = np.zeros((n, len(SCRIPT_RANGES)), dtype=np.int64)
    for j, (_lang, rng) in enumerate(SCRIPT_RANGES):
        script[:, j] = counts(rng)
    latin = counts("[A-Za-z]")

    marker = np.zeros((n, len(WIDE_MARKERS)), dtype=np.int64)
    for j, (_lang, words) in enumerate(WIDE_MARKERS):
        marker[:, j] = counts(marker_pattern(words))

    script_langs = np.array([l for l, _ in SCRIPT_RANGES], dtype=object)
    marker_langs = np.array([l for l, _ in WIDE_MARKERS], dtype=object)
    best_script = np.argmax(script, axis=1)
    best_script_count = script[np.arange(n), best_script]

    langs = marker_langs[np.argmax(marker, axis=1)]
    use_script = best_script_count > latin
    langs[use_script] = script_langs[best_script[use_script]]

    # sub-rules on the script winners
    if use_script.any():
        kana = counts(_KANA) > 0
        langs[use_script & (langs == "zh") & kana] = "ja"
        uk = counts(_UK_LETTERS) > 0
        langs[use_script & (langs == "ru") & uk] = "uk"
        fa = counts(_FA_LETTERS) > 0
        langs[use_script & (langs == "ar") & fa] = "fa"
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
