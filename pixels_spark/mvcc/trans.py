"""Transaction service: trans-id + commit-timestamp oracle.

Reference: ``pixels-common/.../transaction/TransService.java`` —
``beginTrans(readOnly):135`` hands out (transId, timestamp) from a central
timestamp oracle; ``commitTrans:197`` finalizes. Read-only transactions get
the current high-watermark; writers get a fresh monotonically increasing
commit timestamp, which is what gives snapshot isolation.

Here the oracle is a JSON counter file. Two properties make it safe for
concurrent writers (e.g. a streaming ingester and a batch writer sharing
the table):

- every read-modify-write holds an exclusive ``flock`` on a sidecar lock
  file, so two writers can never draw the same timestamp;
- the high-watermark only advances past a CONTIGUOUSLY COMMITTED prefix of
  timestamps: a writer's ts enters a pending set at begin and leaves it at
  commit/abort, and the watermark is min(pending)-1 — readers therefore
  never observe a snapshot that a straggling lower-ts writer could still
  change (repeatable snapshots). An abandoned transaction holds the
  watermark back until ``abort_trans`` releases its ts.

At scale this becomes a real service; the contract (monotonic ts, readers
see ≤ watermark, watermark ≤ every uncommitted ts) is what parity needs.
"""

from __future__ import annotations

import fcntl
import json
import os
from contextlib import contextmanager
from dataclasses import dataclass


@dataclass
class TransContext:
    trans_id: int
    timestamp: int
    read_only: bool
    committed: bool = False


class TransService:
    def __init__(self, root: str):
        self.path = os.path.join(root, "_trans_oracle.json")
        self.lock_path = os.path.join(root, "_trans_oracle.lock")
        os.makedirs(root, exist_ok=True)
        with self._locked():
            if not os.path.exists(self.path):
                self._write(
                    {
                        "next_trans_id": 1,
                        "next_ts": 1,
                        "high_watermark": 0,
                        "pending": [],
                    }
                )

    @contextmanager
    def _locked(self):
        """Exclusive advisory lock over the oracle state — serializes the
        read-modify-write so concurrent writers can't draw the same ts."""
        with open(self.lock_path, "a") as lf:
            fcntl.flock(lf, fcntl.LOCK_EX)
            try:
                yield
            finally:
                fcntl.flock(lf, fcntl.LOCK_UN)

    def _read(self) -> dict:
        with open(self.path) as f:
            state = json.load(f)
        state.setdefault("pending", [])
        return state

    def _write(self, state: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)

    def begin_trans(self, read_only: bool = False) -> TransContext:
        """≈ TransService.beginTrans:135 — readers get the watermark (see
        only committed data), writers draw a fresh commit timestamp."""
        with self._locked():
            state = self._read()
            trans_id = state["next_trans_id"]
            state["next_trans_id"] += 1
            if read_only:
                ts = state["high_watermark"]
            else:
                ts = state["next_ts"]
                state["next_ts"] += 1
                state["pending"].append(ts)
            self._write(state)
        return TransContext(trans_id=trans_id, timestamp=ts, read_only=read_only)

    def _advance_watermark(self, state: dict) -> None:
        """Watermark = highest ts with no uncommitted ts at or below it."""
        if state["pending"]:
            frontier = min(state["pending"]) - 1
        else:
            frontier = state["next_ts"] - 1
        if frontier > state["high_watermark"]:
            state["high_watermark"] = frontier

    def commit_trans(self, ctx: TransContext) -> None:
        """≈ commitTrans:197 — publishes the writer's timestamp. The
        watermark advances only up to the contiguous committed prefix, so a
        commit of ts N while ts N-1 is still in flight does NOT expose N."""
        with self._locked():
            state = self._read()
            if not ctx.read_only:
                if ctx.timestamp in state["pending"]:
                    state["pending"].remove(ctx.timestamp)
                self._advance_watermark(state)
            self._write(state)
        ctx.committed = True

    def abort_trans(self, ctx: TransContext) -> None:
        """Release an uncommitted writer's ts so it stops holding back the
        watermark (its _commit=<ts> dir, if any, stays invisible only if
        the caller cleans it up — aborts before any write are always safe)."""
        with self._locked():
            state = self._read()
            if not ctx.read_only and ctx.timestamp in state["pending"]:
                state["pending"].remove(ctx.timestamp)
                self._advance_watermark(state)
            self._write(state)

    @property
    def high_watermark(self) -> int:
        return self._read()["high_watermark"]
