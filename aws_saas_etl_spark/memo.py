"""Session-scoped stored-artifact memos, self-registering.

Several operators model a STORED artifact (content clusters, shingle
table, fitted IVF centroids, manifest frames): in production each is
written once and read back from object storage, so computing it once per
session is the faithful serving shape. Every such cache is a
``MemoDict`` — a plain dict that (a) registers itself in a module-level
registry so ``session.clear_session_memos`` and the scale/plan tools can
purge ALL stored state without hand-curating a list, and (b) records
reads and writes while a ``track()`` context is active so ``bench.py``
can DERIVE which registered queries are memo-backed (two-regime
cold/warm cost) instead of maintaining the set by hand (VERDICT r7 #4:
the hand-curated six missed ``ann_index_staleness_report`` and its
10.4 s canary spread masqueraded as noise).
"""

from __future__ import annotations

from typing import Any

_REGISTRY: list["MemoDict"] = []

# While non-None, every MemoDict get/set appends its memo's name here —
# bench wraps each query invocation in ``track()`` and reads this back.
# SINGLE-THREAD ASSUMPTION (ADVICE r8): the trace is a module global, so
# concurrent query CONSTRUCTION under an active track() would
# cross-attribute memo touches between queries. bench/plan_audit build
# plans strictly sequentially; a future parallel harness must switch this
# to a contextvars.ContextVar before tracking concurrently.
_TRACE: list[str] | None = None

# Sibling trace for traced=False memos (r14, VERDICT r13 #6): sizing-scalar
# caches stay OUT of the main trace (their cold≈warm split carries no
# information for the cold/warm table) but their touches are no longer
# invisible — bench.py reports which queries read a sizing cache under a
# separate ``sizing_cache_touched`` key, so the one-metadata-job flattering
# of best-of-2 rep 2 is visible in the bench line without polluting the
# stored-artifact cold/warm table.
_TRACE_SIZING: list[str] | None = None


class Touches(list):
    """The list ``track()`` yields: traced-memo names in the list body,
    untraced (sizing) memo names in ``.sizing``."""

    def __init__(self) -> None:
        super().__init__()
        self.sizing: list[str] = []


class MemoDict(dict):
    """dict + self-registration + read/write tracing.

    ``traced=False`` (r13) registers the memo for ``clear_all`` — so cold
    measurement stays honest: a memo-cleared rep re-pays the cached work —
    WITHOUT reporting touches to ``track()``. Use it for bounded SIZING
    scalars (table row counts, append-cut ids): they are catalog-statistic
    metadata whose recompute cost is one metadata-ish job, not the
    two-regime stored-artifact cost the bench's cold/warm table exists to
    expose, so tracing them would flood that table with rows whose
    cold≈warm split carries no information.
    """

    def __init__(self, name: str, traced: bool = True) -> None:
        super().__init__()
        self.name = name
        self.traced = traced
        _REGISTRY.append(self)

    def _trace(self) -> None:
        if self.traced:
            if _TRACE is not None:
                _TRACE.append(self.name)
        elif _TRACE_SIZING is not None:
            _TRACE_SIZING.append(self.name)

    def get(self, key: Any, default: Any = None) -> Any:
        self._trace()
        return super().get(key, default)

    def __getitem__(self, key: Any) -> Any:
        self._trace()
        return super().__getitem__(key)

    def __setitem__(self, key: Any, value: Any) -> None:
        self._trace()
        super().__setitem__(key, value)


def clear_all() -> None:
    """Purge every registered memo — the cold-path reset used by
    bench/scale_probe/plan_audit (and clear_session_memos)."""
    for m in _REGISTRY:
        m.clear()


def all_memos() -> list[MemoDict]:
    return list(_REGISTRY)


#: Shared registry for DERIVED-SET sizing scalars (r14, VERDICT r13 #4):
#: the lifecycle queries' base/delta boundaries over derived id sets
#: (minhash signature ids, lexical postings ids, span-gram / BPE doc
#: sets) each cost one count job plus one sort/limit job per
#: construction — and the minhash one executes the full signature chain
#: twice just to size it. Same regime as ``similarity._APPEND_CUT_CACHE``:
#: untraced (no cold/warm membership change; surfaced via the sizing
#: trace), cleared with the session memos so cold reps re-pay it.
_DERIVED_CUT_CACHE = MemoDict("derived_cut", traced=False)


def derived_scalar_cached(spark, tag: tuple, build):
    """Session-cache a bounded sizing SCALAR (an id cut, a doc count)
    keyed by (applicationId, *tag); ``build()`` runs once per session."""
    key = (spark.sparkContext.applicationId, *tag)
    got = _DERIVED_CUT_CACHE.get(key)
    if got is None:
        got = build()
        _DERIVED_CUT_CACHE[key] = got
    return got


class track:
    """Context manager: records which memos were touched inside it.

    >>> with track() as touched:
    ...     run_query()
    >>> bool(touched)          # query is memo-backed (stored artifact)
    >>> bool(touched.sizing)   # query read an untraced sizing cache
    """

    def __enter__(self) -> Touches:
        global _TRACE, _TRACE_SIZING
        self._prev = _TRACE
        self._prev_sizing = _TRACE_SIZING
        touches = Touches()
        _TRACE = touches
        _TRACE_SIZING = touches.sizing
        return touches

    def __exit__(self, *exc: Any) -> None:
        global _TRACE, _TRACE_SIZING
        _TRACE = self._prev
        _TRACE_SIZING = self._prev_sizing
