"""HTML boilerplate stripping — main-content extraction for HTML documents.

The reference only ever sets ``html_data=None`` (PDF-only), but the target
system's scope includes HTML main-content extraction (boilerplate strip + DOM
heuristics). This module implements a deterministic, vectorizable heuristic in
the spirit of published boilerplate-removal work (Kohlschütter et al.,
"Boilerplate Detection using Shallow Text Features", WSDM 2010): segment the
DOM into text blocks at block-level tags, score each block by link density and
length, keep the content blocks.

Rule: a block is content iff it has zero links, or it is long (>= 20 words)
with link density <= 0.1. Navigation/asides/footers carry links; headings and
short content paragraphs don't.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# non-content subtrees removed wholesale (head covers <title>). NB: explicit
# alternation, no backreferences — the same pattern must run under both
# Python re and pyarrow's RE2 (which has no backreferences).
_DROP_SUBTREE_PAT = (
    r"(?si)(<script\b.*?</script\s*>|<style\b.*?</style\s*>|<head\b.*?</head\s*>"
    r"|<noscript\b.*?</noscript\s*>|<svg\b.*?</svg\s*>|<iframe\b.*?</iframe\s*>)"
)
_COMMENT_PAT = r"(?s)<!--.*?-->"
# block-level boundaries -> newline, so blocks can be scored independently
_BLOCK_TAG_PAT = (
    r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|nav|footer|header|aside|"
    r"section|article|main|form|blockquote)\b[^>]*>"
)
_DROP_SUBTREE = re.compile(_DROP_SUBTREE_PAT)
_COMMENT = re.compile(_COMMENT_PAT)
_BLOCK_TAG = re.compile(_BLOCK_TAG_PAT)
_A_OPEN = re.compile(r"(?i)<a\b")
_ANY_TAG = re.compile(r"(?s)<[^>]+>")
_WS = re.compile(r"\s+")

LONG_BLOCK_WORDS = 20
MAX_LINK_DENSITY_LONG = 0.1


def _score_blocks(segmented: str) -> str:
    """Keep content blocks of a pre-segmented (newline-separated) document."""
    blocks = []
    for raw in segmented.split("\n"):
        n_links = len(_A_OPEN.findall(raw))
        text = _WS.sub(" ", _ANY_TAG.sub(" ", raw)).strip()
        if not text:
            continue
        words = text.count(" ") + 1
        if n_links == 0 or (
            words >= LONG_BLOCK_WORDS and n_links / words <= MAX_LINK_DENSITY_LONG
        ):
            blocks.append(text)
    return " ".join(blocks)


def extract_main_content(html: str) -> str:
    """Main text content of one HTML document (content blocks joined by ' ')."""
    s = _COMMENT.sub(" ", _DROP_SUBTREE.sub(" ", html))
    return _score_blocks(_BLOCK_TAG.sub("\n", s))


def strip_html_batch(batch: pa.Table, html_col: str = "html") -> pa.Table:
    """Vectorized batch kernel: adds a ``main_text`` column. The heavy regex
    passes (subtree/comment removal, block segmentation) run as pyarrow re2
    kernels over the whole column; scoring loops over blocks, not characters."""
    col = batch.column(html_col)
    col = pc.replace_substring_regex(col, _DROP_SUBTREE_PAT, " ")
    col = pc.replace_substring_regex(col, _COMMENT_PAT, " ")
    col = pc.replace_substring_regex(col, _BLOCK_TAG_PAT, "\n")
    out = [_score_blocks(s) for s in col.to_pylist()]
    return batch.append_column("main_text", pa.array(out, type=pa.string()))


def synthesize_html(doc_id: str, title: str, text: str, words_per_para: int = 12) -> str:
    """Deterministic HTML wrapper for a plain-text document: realistic
    boilerplate (head/title, nav with links, sidebar, linked footer) around
    the content paragraphs. Used to derive an HTML corpus from the
    ``documents`` table; a correct extractor returns exactly ``text``."""
    ws = text.split(" ")
    paras = [
        "<p>" + " ".join(ws[i : i + words_per_para]) + "</p>"
        for i in range(0, len(ws), words_per_para)
    ]
    return (
        "<html><head><title>"
        + title
        + "</title><style>body{margin:0}</style><script>var t=1;</script></head>"
        + '<body><nav><a href="/">home</a> <a href="/x">docs</a> '
        + f'<a href="/d/{doc_id}">self</a></nav>'
        + '<aside>related items <a href="/r1">one</a> <a href="/r2">two</a></aside>'
        + '<div class="content">'
        + "".join(paras)
        + '</div><footer>copyright <a href="/legal">example corp</a></footer>'
        + "</body></html>"
    )
