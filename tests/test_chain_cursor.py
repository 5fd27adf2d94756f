"""Replay-window chain state machine (state/chain_cursor.py) vs the
akamaisiemreceiver semantics (internal/poller/poller.go:437-505,
receiver_test.go branch scenarios)."""

import pytest

from opentelemetry_collector_components_ray.state.chain_cursor import (
    API_SAFETY_BUFFER_SEC,
    CHAIN_OVERLAP_SEC,
    MAX_LOOKBACK_SEC,
    ChainCursor,
    CursorStore,
    advance_cursor,
    build_fetch_params,
    poll_chain,
)

NOW = 1_700_000_000


def test_first_run_opens_new_chain():
    cur = ChainCursor()
    p = build_fetch_params(cur, NOW, event_limit=100,
                           initial_lookback_sec=3600)
    assert p.branch == "new"
    assert p.from_ts == NOW - 3600
    assert p.to_ts == NOW - API_SAFETY_BUFFER_SEC
    assert cur.chain_from == p.from_ts and cur.chain_to == p.to_ts
    assert not cur.caught_up


def test_branch1_drain_resumes_with_offset():
    """receiver_test.go:233 — caught_up=false + valid offset resumes
    offset-based."""
    cur = ChainCursor(chain_from=NOW - 100, chain_to=NOW - 60,
                      caught_up=False, last_offset="off-7",
                      offset_obtained_at=NOW - 5)
    p = build_fetch_params(cur, NOW, 100, 3600, offset_ttl_sec=300)
    assert p.branch == "drain"
    assert p.offset == "off-7"
    assert p.from_ts == 0 and p.to_ts == 0  # offset-based, not time


def test_branch2_replay_on_stale_offset():
    cur = ChainCursor(chain_from=NOW - 100, chain_to=NOW - 60,
                      caught_up=False, last_offset="off-7",
                      offset_obtained_at=NOW - 1000)
    p = build_fetch_params(cur, NOW, 100, 3600, offset_ttl_sec=300)
    assert p.branch == "replay"
    assert cur.last_offset == ""  # cleared for replay
    assert p.from_ts == NOW - 100 - CHAIN_OVERLAP_SEC  # re-anchored
    assert p.to_ts == NOW - 60


def test_branch2_clamps_to_max_lookback():
    cur = ChainCursor(chain_from=NOW - MAX_LOOKBACK_SEC - 5000,
                      chain_to=NOW - 60, caught_up=False)
    p = build_fetch_params(cur, NOW, 100, 3600)
    assert p.branch == "replay"
    assert p.from_ts == NOW - MAX_LOOKBACK_SEC


def test_branch3_new_chain_overlaps_previous():
    """receiver_test.go:219-226 — caught_up means the previous chain
    finished; a new chain uses from/to with overlap, not offset."""
    cur = ChainCursor(chain_from=NOW - 400, chain_to=NOW - 200,
                      caught_up=True, last_offset="off-stale",
                      offset_obtained_at=NOW - 50)
    p = build_fetch_params(cur, NOW, 100, 3600)
    assert p.branch == "new"
    assert p.offset == ""
    assert p.from_ts == NOW - 200 - CHAIN_OVERLAP_SEC
    assert cur.last_offset == ""


def test_advance_transitions():
    cur = ChainCursor(caught_up=False)
    # full page + offset -> keep draining
    assert advance_cursor(cur, 100, "o1", 100, NOW) is False
    assert cur.last_offset == "o1" and not cur.caught_up
    # short page -> drained
    assert advance_cursor(cur, 40, "o2", 100, NOW) is True
    assert cur.caught_up
    # zero events -> drained immediately
    cur2 = ChainCursor()
    assert advance_cursor(cur2, 0, "", 100, NOW) is True
    assert cur2.caught_up
    # full page but missing offset -> stop without drained flag
    cur3 = ChainCursor()
    assert advance_cursor(cur3, 100, "", 100, NOW) is True
    assert not cur3.caught_up


def test_poll_chain_pages_until_drained(tmp_path):
    store = CursorStore(str(tmp_path / "cursor.json"))
    pages = [(100, "o1"), (100, "o2"), (30, "o3")]
    seen = []

    def fetch(params):
        seen.append((params.branch, params.offset))
        return pages[len(seen) - 1]

    r = poll_chain(fetch, store, event_limit=100,
                   initial_lookback_sec=3600, now_fn=lambda: NOW)
    assert r == {"branch": "new", "pages": 3, "events": 230}
    assert seen[0] == ("new", "")
    assert seen[1] == ("drain", "o1")
    assert seen[2] == ("drain", "o2")
    cur = store.load()
    assert cur.caught_up and cur.last_offset == "o3"

    # next cycle: caught up -> new chain overlapping the last window
    def fetch2(params):
        assert params.branch == "new"
        assert params.from_ts == cur.chain_to - CHAIN_OVERLAP_SEC
        return (0, "")

    r2 = poll_chain(fetch2, store, 100, 3600, now_fn=lambda: NOW + 300)
    assert r2["branch"] == "new"
    assert store.load().caught_up


def test_poll_chain_crash_resume_replays(tmp_path):
    """Crash mid-chain with a stale offset → next cycle replays the
    chain window (README error-recovery table: offset expired →
    replay)."""
    store = CursorStore(str(tmp_path / "cursor.json"))

    def fetch(params):
        return (100, "o1")  # full page, then we 'crash'

    poll_chain(fetch, store, 100, 3600, now_fn=lambda: NOW, max_pages=1)
    cur = store.load()
    assert not cur.caught_up and cur.last_offset == "o1"

    # resume much later: offset aged past TTL -> branch 2 replay
    def fetch2(params):
        assert params.branch == "replay"
        assert params.offset == ""
        assert params.to_ts == cur.chain_to
        return (10, "")

    r = poll_chain(fetch2, store, 100, 3600, offset_ttl_sec=300,
                   now_fn=lambda: NOW + 10_000)
    assert r["branch"] == "replay"
    assert store.load().caught_up
