"""One-switch scale profile: flips the skew caps and graph/vocab backends
that separate "exact small-corpus oracle semantics" from "safe at 100 TB".

The oracle-exact defaults (uncapped hot keys, auto backend thresholds) are
right for correctness gates and modest corpora, but a web-scale run must
cap quadratic hot blocks and keep graph/vocab state dataset-resident. Every
affected operator keeps its explicit keyword (callers can always override
per call); when the keyword is left at its ``"profile"`` default the value
resolves from the active profile, so one switch configures a whole job:

    export RAY_EXTRACT_PROFILE=web          # process-wide

or in code::

    from ray_extract import profile
    profile.set_profile("web")              # session-wide
    profile.set_profile(None)               # back to the env / exact

Profiles
--------
``exact`` (default): uncapped ``max_shingle_df`` / ``max_block_df`` (the
DuckDB oracles require the full pair set) and ``auto`` backends (broadcast
below the node-memory thresholds, join above).

``web``: hot-key document-frequency caps ON (a shingle/block key shared by
more than ``df_cap`` documents is boilerplate, not signal — dropping it
bounds per-bucket pair work at quadratic-in-cap instead of quadratic-in-
corpus) and graph/vocab backends FORCED to ``join`` so no stage ever
assumes node-scale state fits one worker, regardless of the measured size.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

# sentinel default for per-operator keywords: resolve from the active profile
FROM_PROFILE = "profile"


@dataclass(frozen=True)
class ScaleProfile:
    name: str
    # hot-key document-frequency caps; None = uncapped (exact oracle output)
    max_shingle_df: int | None
    max_block_df: int | None
    # strategy for dup-graph labels/edges and the tf-idf vocabulary:
    # "auto" = broadcast below threshold, join above; "join" = always
    # dataset-resident
    graph_backend: str


EXACT = ScaleProfile("exact", max_shingle_df=None, max_block_df=None,
                     graph_backend="auto")
# df caps: a key shared by >1000 docs contributes >499k pairs on its own —
# at web scale that is template/boilerplate by construction. Tune per corpus.
WEB = ScaleProfile("web", max_shingle_df=1000, max_block_df=1000,
                   graph_backend="join")

_PROFILES = {"exact": EXACT, "web": WEB}
_ACTIVE: ScaleProfile | None = None


def set_profile(profile: "ScaleProfile | str | None") -> None:
    """Activate a profile session-wide; ``None`` falls back to the
    ``RAY_EXTRACT_PROFILE`` env var (default ``exact``)."""
    global _ACTIVE
    if isinstance(profile, str):
        profile = _PROFILES[profile]
    _ACTIVE = profile


def active_profile() -> ScaleProfile:
    if _ACTIVE is not None:
        return _ACTIVE
    return _PROFILES[os.environ.get("RAY_EXTRACT_PROFILE", "exact").lower()]


def resolve(value, field: str):
    """Per-operator keyword resolution: explicit values pass through,
    the ``FROM_PROFILE`` sentinel reads the active profile's ``field``."""
    if isinstance(value, str) and value == FROM_PROFILE:
        return getattr(active_profile(), field)
    return value
