"""Shared commit-protocol helpers for the epoch-keyed streaming sinks
(dedup_stream / bloom_stream / rate_monitor / dynamic_batching).

Epoch-keyed replay detection trusts ``epoch_id`` — which Structured
Streaming only keeps meaningful WITHIN one checkpoint lineage.
Restarting a stream without a checkpoint (or with a fresh one) restarts
epoch ids at 0, so an existing state dir would treat the new stream's
epoch 0 as "already committed" and silently return the OLD epoch's
output instead of processing the new batch. The guard here binds a
state dir to one stream lineage: the first epoch-keyed commit stamps a
``RUN`` marker with the stream's stable id (the checkpoint's
``metadata`` UUID — constant across restarts FROM THE SAME checkpoint,
fresh for a fresh one), and every later call must present the same id
or gets a loud error instead of silent data loss.
"""

from __future__ import annotations

import json
import os


def checkpoint_run_id(checkpoint_dir: str) -> str:
    """The stream's stable identity: the ``id`` UUID Structured
    Streaming writes to ``<checkpoint_dir>/metadata`` on first start
    and reuses on every restart from that checkpoint. Read lazily from
    inside ``foreachBatch`` (the file exists by the time the first
    batch fires)."""
    with open(os.path.join(checkpoint_dir, "metadata")) as fh:
        return str(json.load(fh)["id"])


def check_run_marker(state_dir: str, run_id: str, *, what: str) -> None:
    """Bind ``state_dir`` to ``run_id``: stamp a ``RUN`` marker on
    first use, raise if a different run already owns the dir. Raising
    unconditionally on mismatch (not just on committed-epoch
    short-circuits) is deliberate — epoch numbering from a different
    stream lineage is meaningless for EVERY epoch decision against
    this state, so the only safe answers are "same run" or "fresh
    state_dir"."""
    marker = os.path.join(state_dir, "RUN")
    if os.path.exists(marker):
        with open(marker) as fh:
            stored = fh.read().strip()
        if stored != str(run_id):
            raise ValueError(
                f"{what} state dir {state_dir!r} is bound to stream run "
                f"{stored!r} but this call presents run {run_id!r} — "
                "epoch ids from a different stream lineage (e.g. a "
                "restart with a fresh checkpoint) would misread this "
                "state's committed epochs and silently drop or replay "
                "data; restart from the original checkpoint or use a "
                "fresh state_dir")
        return
    os.makedirs(state_dir, exist_ok=True)
    with open(marker, "w") as fh:
        fh.write(str(run_id))
