"""Transaction service: trans-id + commit-timestamp oracle.

Reference: ``pixels-common/.../transaction/TransService.java`` —
``beginTrans(readOnly):135`` hands out (transId, timestamp) from a central
timestamp oracle; ``commitTrans:197`` finalizes. Read-only transactions get
the current high-watermark; writers get a fresh monotonically increasing
commit timestamp, which is what gives snapshot isolation.

Here the oracle is a JSON counter file with atomic replace — single-writer
semantics like the reference's daemon. At scale this becomes a real service;
the contract (monotonic ts, readers see ≤ watermark) is what parity needs.
"""

from __future__ import annotations

import json
import os
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
        os.makedirs(root, exist_ok=True)
        if not os.path.exists(self.path):
            self._write({"next_trans_id": 1, "next_ts": 1, "high_watermark": 0})

    def _read(self) -> dict:
        with open(self.path) as f:
            return json.load(f)

    def _write(self, state: dict) -> None:
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self.path)

    def begin_trans(self, read_only: bool = False) -> TransContext:
        """≈ TransService.beginTrans:135 — readers get the watermark (see
        only committed data), writers draw a fresh commit timestamp."""
        state = self._read()
        trans_id = state["next_trans_id"]
        state["next_trans_id"] += 1
        if read_only:
            ts = state["high_watermark"]
        else:
            ts = state["next_ts"]
            state["next_ts"] += 1
        self._write(state)
        return TransContext(trans_id=trans_id, timestamp=ts, read_only=read_only)

    def commit_trans(self, ctx: TransContext) -> None:
        """≈ commitTrans:197 — publishes the writer's timestamp."""
        state = self._read()
        if not ctx.read_only and ctx.timestamp > state["high_watermark"]:
            state["high_watermark"] = ctx.timestamp
        self._write(state)
        ctx.committed = True

    @property
    def high_watermark(self) -> int:
        return self._read()["high_watermark"]
