"""Unit tests for the session-scoped scratch pruner.

Pins the r9 ADVICE fix: pruning requires BOTH an old run tag and true
mtime-idleness, so a live concurrent session (old tag, fresh writes) is
never deleted even under bench.py's shorter 30-minute margin.
"""
from __future__ import annotations

import os
import time

import hippo_claim_crossover_spark.session as sess


def _touch(path: str, mtime: float) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("x")
    os.utime(path, (mtime, mtime))


def test_tree_is_idle_short_circuits_on_fresh_file(tmp_path):
    root = str(tmp_path / "d")
    old = time.time() - 7200
    _touch(os.path.join(root, "a", "old.txt"), old)
    os.utime(os.path.join(root, "a"), (old, old))
    os.utime(root, (old, old))
    cutoff = time.time() - 1800
    assert sess._tree_is_idle(root, cutoff)
    _touch(os.path.join(root, "a", "fresh.txt"), time.time())
    assert not sess._tree_is_idle(root, cutoff)


def test_prune_skips_live_session_with_old_tag(tmp_path, monkeypatch):
    """A session whose tag is >margin old but that is still WRITING must
    survive the prune — the exact scenario the tag-age-only rule broke."""
    scratch = tmp_path / "scratch"
    scratch.mkdir()
    monkeypatch.setattr(sess, "_SCRATCH_ROOTS", (str(scratch),))
    now = time.time()
    old_ms = int((now - 3600) * 1000)  # session started 1h ago
    live = scratch / f"q_sink-local-{old_ms}"
    dead = scratch / f"q_sink-local-{old_ms - 1000}"
    _touch(str(live / "part-0"), now)            # still writing
    _touch(str(dead / "part-0"), now - 3600)     # untouched for 1h
    os.utime(str(live), (now, now))
    os.utime(str(dead), (now - 3600, now - 3600))
    sess._prune_stale_scratch(f"local-{int(now * 1000)}", idle_secs=1800)
    assert live.exists(), "live session's scratch was deleted"
    assert not dead.exists(), "idle stale scratch was kept"


def test_prune_keeps_untagged_and_own_entries(tmp_path, monkeypatch):
    scratch = tmp_path / "scratch"
    scratch.mkdir()
    monkeypatch.setattr(sess, "_SCRATCH_ROOTS", (str(scratch),))
    now = time.time()
    my_ms = int(now * 1000)
    old = now - 7200
    mine = scratch / f"q_sink-local-{my_ms}"
    shared = scratch / "binfiles"
    _touch(str(mine / "part-0"), old)
    _touch(str(shared / "img0.bin"), old)
    for d in (mine, shared):
        os.utime(str(d), (old, old))
    sess._prune_stale_scratch(f"local-{my_ms}", idle_secs=1800)
    assert mine.exists(), "current session's own scratch was deleted"
    assert shared.exists(), "untagged shared fixture was deleted"
