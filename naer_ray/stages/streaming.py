"""Stream-shaped processing with incremental actor state.

Ray Data has no event-time windows; for batch-expressible windows the
``groupby(key).map_groups`` pattern wins (pipelines/queries.q07/q08/q20).
This module demonstrates the remaining case from SURVEY.md §2.9: state
that must persist ACROSS batches in arrival order — kept in plain Ray
actors, one per key-hash bucket, fed batches in timestamp order (actor
tasks from one submitter execute in submission order, so per-actor
arrival order follows the globally sorted stream).

The result is bit-identical to the batch sessionizer (oracle-checked),
but the execution model is the one a true streaming source would use:
bounded state per actor, constant memory, order-dependent updates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


@ray.remote
class SessionStateActor:
    """Per-bucket incremental sessionizer: user -> (last_ts, sessions, events)."""

    def __init__(self, gap_us: int):
        self.gap_us = gap_us
        self.last_ts: dict[int, int] = {}
        self.n_sessions: dict[int, int] = {}
        self.n_events: dict[int, int] = {}

    def ingest(self, users: np.ndarray, ts_us: np.ndarray) -> int:
        for u, t in zip(users.tolist(), ts_us.tolist()):
            prev = self.last_ts.get(u)
            if prev is None:
                self.n_sessions[u] = 1
                self.n_events[u] = 1
            else:
                if t - prev > self.gap_us:
                    self.n_sessions[u] += 1
                self.n_events[u] += 1
            self.last_ts[u] = t
        return len(users)

    def finish(self) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": sorted(self.n_events),
                "n_sessions": [self.n_sessions[u] for u in sorted(self.n_events)],
                "n_events": [self.n_events[u] for u in sorted(self.n_events)],
            }
        )


def streaming_sessionize(
    events_ds, n_actors: int = 8, gap_s: int = 1800, batch_size: int = 65536
) -> pd.DataFrame:
    """events (user_id, ts) -> per-user session counts via stateful actors.

    One global ``sort("ts")`` establishes event-time order; the driver
    routes each sorted batch's rows to user-hash-bucket actors.  At
    cluster scale the same topology holds with a repartition-by-hash
    feeding node-local actors instead of a driver loop.
    """
    actors = [SessionStateActor.remote(gap_s * 1_000_000) for _ in range(n_actors)]
    pending = []
    for batch in events_ds.sort("ts").iter_batches(
        batch_format="pyarrow", batch_size=batch_size
    ):
        users = batch["user_id"].to_numpy()
        ts_us = batch["ts"].cast("int64").to_numpy()
        buckets = users % n_actors
        for b in range(n_actors):
            mask = buckets == b
            if mask.any():
                pending.append(actors[b].ingest.remote(users[mask], ts_us[mask]))
    ray.get(pending)  # barrier: all ingests applied
    frames = ray.get([a.finish.remote() for a in actors])
    out = pd.concat(frames, ignore_index=True).sort_values("user_id")
    return out.reset_index(drop=True)
