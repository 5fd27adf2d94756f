"""Replay-window chain cursor — the akamaisiemreceiver poll state
machine, transport-agnostic.

The reference re-polls a mutable, offset-paginated source with a
three-branch state machine (receiver/akamaisiemreceiver/
README.md:83-120, internal/poller/poller.go:437-505
``buildFetchParams``):

- **Branch 1 — DRAIN**: chain in progress and the stored offset is
  still valid (not past ``offset_ttl``) → continue offset-based
  pagination.
- **Branch 2 — REPLAY**: chain in progress but the offset is gone or
  stale → clear it and re-fetch the chain's time window, re-anchored
  ``chain_overlap`` seconds early and clamped to the source's maximum
  lookback (events older than that are lost; the reference logs a
  warning and counts an OffsetTTL drop).
- **Branch 3 — NEW CHAIN**: caught up (or first run) → open a fresh
  window from ``chain_to - chain_overlap`` (or ``now -
  initial_lookback`` on first run) to ``now - api_safety_buffer``.

Page-processing transitions mirror poller.go:255-283: zero events ⇒
drained; a returned next-offset is stored with its obtained-at time;
``caught_up = event_count < event_limit`` (a short page means the
chain is drained).  The cursor is persisted after EVERY page (cursor
store semantics: persist only after the page's batches succeed —
callers persist after their own processing commits).

This engine is batch, so the fetch itself is a callable the caller
provides (a directory lister, an HTTP pager, a database query) —
the state machine is what carries over.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Optional, Tuple

# poller.go:96-106
CHAIN_OVERLAP_SEC = 10
MAX_LOOKBACK_SEC = 12 * 60 * 60
API_SAFETY_BUFFER_SEC = 60


@dataclass
class ChainCursor:
    """internal/cursor/cursor.go:34-41."""

    chain_from: int = 0
    chain_to: int = 0
    caught_up: bool = False
    last_offset: str = ""
    offset_obtained_at: float = 0.0  # unix seconds; 0 = unset

    def is_offset_stale(self, ttl_sec: float, now: float) -> bool:
        """cursor.go:44-49 — TTL 0 disables staleness."""
        if ttl_sec == 0 or not self.last_offset:
            return False
        return (
            self.offset_obtained_at > 0
            and now - self.offset_obtained_at > ttl_sec
        )

    def clear_offset(self) -> None:
        self.last_offset = ""
        self.offset_obtained_at = 0.0


@dataclass
class FetchParams:
    """Either offset-based (offset set) or time-based (from/to set)."""

    limit: int
    offset: str = ""
    from_ts: int = 0
    to_ts: int = 0
    branch: str = ""  # "drain" | "replay" | "new" (for logs/tests)


def _clamp_to_max_lookback(from_ts: int, now: int) -> int:
    return max(from_ts, now - MAX_LOOKBACK_SEC)


def build_fetch_params(
    cursor: ChainCursor,
    now: int,
    event_limit: int,
    initial_lookback_sec: int,
    offset_ttl_sec: float = 0,
) -> FetchParams:
    """The three-branch decision (poller.go:437-505).  Mutates the
    cursor exactly where the reference does (branch 2 clears the
    offset; branch 3 opens the new chain window)."""
    if (
        not cursor.caught_up
        and cursor.last_offset
        and not cursor.is_offset_stale(offset_ttl_sec, now)
    ):
        # Branch 1: chain in progress, offset valid — continue draining
        return FetchParams(
            limit=event_limit, offset=cursor.last_offset, branch="drain"
        )

    if not cursor.caught_up and cursor.chain_from != 0:
        # Branch 2: chain in progress, offset gone/stale — replay the
        # chain window re-anchored early and clamped
        cursor.clear_offset()
        from_ts = _clamp_to_max_lookback(
            cursor.chain_from - CHAIN_OVERLAP_SEC, now
        )
        return FetchParams(
            limit=event_limit,
            from_ts=from_ts,
            to_ts=cursor.chain_to,
            branch="replay",
        )

    # Branch 3: caught up or first run — new chain
    if cursor.chain_to != 0:
        from_ts = cursor.chain_to - CHAIN_OVERLAP_SEC
    else:
        from_ts = now - initial_lookback_sec
    from_ts = _clamp_to_max_lookback(from_ts, now)
    to_ts = now - API_SAFETY_BUFFER_SEC
    cursor.chain_from = from_ts
    cursor.chain_to = to_ts
    cursor.caught_up = False
    cursor.clear_offset()
    return FetchParams(
        limit=event_limit, from_ts=from_ts, to_ts=to_ts, branch="new"
    )


def advance_cursor(
    cursor: ChainCursor,
    event_count: int,
    next_offset: str,
    event_limit: int,
    now: float,
) -> bool:
    """Post-page transitions (poller.go:255-283).  Returns True when
    the chain is drained (stop paging)."""
    if event_count == 0:
        cursor.caught_up = True
        return True
    if next_offset:
        cursor.last_offset = next_offset
        cursor.offset_obtained_at = now
    cursor.caught_up = event_count < event_limit
    if cursor.caught_up:
        return True
    if not next_offset:
        # poller.go:281: paginated response with no next offset —
        # cannot continue; end the cycle without marking drained
        return True
    return False


class CursorStore:
    """Atomic JSON persistence (cursor.go CursorStore over the storage
    extension; here a file, written temp+rename like every manifest in
    state/checkpoint.py)."""

    def __init__(self, path: str):
        self.path = path

    def load(self) -> ChainCursor:
        if not os.path.exists(self.path):
            return ChainCursor()
        with open(self.path) as f:
            d = json.load(f)
        return ChainCursor(**d)

    def save(self, cursor: ChainCursor) -> None:
        tmp = self.path + ".tmp"
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(cursor.__dict__, f)
        os.replace(tmp, self.path)


def poll_chain(
    fetch_page: Callable[[FetchParams], Tuple[int, str]],
    store: CursorStore,
    event_limit: int,
    initial_lookback_sec: int,
    offset_ttl_sec: float = 0,
    now_fn: Callable[[], float] = time.time,
    max_pages: int = 1000,
) -> dict:
    """One poll cycle: decide the branch, page until drained, persist
    the cursor after every page (the batch analogue of 'persist only
    after all batches in a page succeed' — ``fetch_page`` returns only
    after the caller has committed the page's events).

    ``fetch_page(params) -> (event_count, next_offset)``.
    Returns {"branch": first branch taken, "pages": n, "events": n}.
    """
    cursor = store.load()
    first_branch = ""
    pages = 0
    events = 0
    for _ in range(max_pages):
        now = int(now_fn())
        params = build_fetch_params(
            cursor, now, event_limit, initial_lookback_sec, offset_ttl_sec
        )
        if not first_branch:
            first_branch = params.branch
        event_count, next_offset = fetch_page(params)
        pages += 1
        events += event_count
        done = advance_cursor(
            cursor, event_count, next_offset, event_limit, now_fn()
        )
        store.save(cursor)
        if done:
            break
    return {"branch": first_branch, "pages": pages, "events": events}
