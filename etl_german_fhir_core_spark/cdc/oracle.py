"""Single-pass pandas replay oracle — FIXTURES.md §6.

Replays a change-event list in plain pandas exactly as the reference's sequential
delete-then-insert loop would (ORDER BY id scan, TaskConfiguration.java:344-348 +
keyed upsert, ConditionMapper.java:131-140): sort by the LWW total order (ts, lsn),
apply I/U/D per key into a dict, emit final state sorted by (conv_id, turn_idx).

This is the correctness gate for table-state equivalence: per-turn text equality under
stable turn ordering (BASELINE.json input_hint).
"""

from __future__ import annotations

import pandas as pd


def replay_oracle(events: pd.DataFrame, payload_cols: list[str] | None = None) -> pd.DataFrame:
    """events columns: lsn, op, conv_id, turn_idx, ts, + payload. Returns the expected
    final table state (payload + ts per surviving key)."""
    payload_cols = payload_cols or [
        c for c in events.columns if c not in ("lsn", "op", "conv_id", "turn_idx")
    ]
    ev = events.sort_values(["ts", "lsn"], kind="mergesort")
    state: dict[tuple, dict] = {}
    for row in ev.itertuples(index=False):
        key = (row.conv_id, row.turn_idx)
        if row.op == "D":
            state.pop(key, None)
        else:
            state[key] = {c: getattr(row, c) for c in payload_cols}
    out = pd.DataFrame(
        [
            {"conv_id": k[0], "turn_idx": k[1], **v}
            for k, v in state.items()
        ],
        columns=["conv_id", "turn_idx", *payload_cols],
    )
    return out.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
