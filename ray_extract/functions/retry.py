"""Bounded retry for transient faults (reference F5).

Mirrors the reference's ``call_api_with_error_handling``
(`/root/reference/src/azure_pdf_parser/utils.py:18-32`, used at
`azure_wrapper.py:86-92,118-124`, tested `tests/test_utils.py:19-48`): call
the function up to ``max_retries`` times, re-raising the final exception.

Two layers in this engine:

- in-kernel: ``call_with_retries`` wraps the per-document parse call; the
  stage dead-letters the document on final failure (the reference silently
  drops it, `run.py:38-39` — dead-letter rows keep corpus error metrics
  exact).
- task-level: actor death (OOM kill, node loss on a real cluster) is covered
  by Ray's own ``max_restarts``/``max_task_retries`` on the parse actor pool
  (see ``pipelines/extract.py``); application exceptions do NOT re-execute
  whole tasks (``retry_exceptions`` stays False) — a deterministic poison
  document must not burn task retries for a whole batch.
"""

from __future__ import annotations

from typing import Callable, TypeVar

T = TypeVar("T")


def call_with_retries(
    fn: Callable[..., T],
    *args,
    max_retries: int = 3,
    retry_exceptions: tuple[type[BaseException], ...] = (Exception,),
    **kwargs,
) -> T:
    """Call ``fn`` up to ``max_retries`` times; re-raise the last exception.

    ``max_retries`` is the TOTAL attempt count (reference utils.py:24 loops
    ``range(retries)``), not the extra-attempt count. Exceptions not listed in
    ``retry_exceptions`` propagate immediately (they are deterministic, not
    transient)."""
    if max_retries < 1:
        raise ValueError("max_retries must be >= 1")
    last: BaseException | None = None
    for _ in range(max_retries):
        try:
            return fn(*args, **kwargs)
        except retry_exceptions as e:  # noqa: PERF203 - bounded, cold path
            last = e
    assert last is not None
    raise last
