"""Gap filling: unblock consumers stuck behind a permanent id hole.

Reference parity (G2): rsql/gapfill.go — ``FillGaps(dbc, events)``
registers the default gap filler with the events table; on a detected
``Gap`` it waits for each missing id to be committed (gaps are usually
in-flight transactions) and inserts a noop event for any id that never
arrives, so every consumer's dense-prefix guard can advance. Noops are
dropped by the standard noop filter downstream (rsql/loader.go:64-94).

File-log translation: a plain parquet ``EventLog`` gets a *transient*
hole when a reader lists the directory mid-append (the missing file lands
moments later — the grace wait absorbs exactly this), and a *permanent*
hole when a writer crashes partway through a multi-file append (some task
files committed, the rest never will). The filler re-checks committed ids
through the grace window, then writes noops for the survivors via
``EventLog.fill_noops`` — which re-checks once more immediately before
writing, the analogue of the reference tolerating ErrDupEntry when a
racing writer got there first (gapfill.go:86-90).

ManifestEventLog does not need this: its manifest commit is atomic and
its base id is recomputed from committed entries, so holes cannot occur
(it overrides ``fill_noops`` to say so).
"""

from __future__ import annotations

import time

from reflex_spark.sources.event_log import EventLog, Gap


def fill_gaps(
    log: EventLog,
    grace_seconds: float = 1.0,
    recheck_interval: float = 0.1,
):
    """Register the default noop gap filler on ``log`` (reference
    rsql/gapfill.go:26-40 FillGaps). Returns the listener (handy for
    tests / explicit invocation).

    The filler runs synchronously in the detecting consumer's poll loop —
    the stream cannot advance past the hole anyway (the reference's
    loader blocks on gaps the same way), and a synchronous fill means the
    very next poll sees the noops.
    """

    def fill(gap: Gap) -> None:
        deadline = time.monotonic() + grace_seconds
        missing = log.missing_ids(gap)
        # Grace: transient holes (mid-append visibility races, in-flight
        # writers) usually close themselves — the analogue of
        # waitCommitted (gapfill.go:97-126) polling for the txn to land.
        while missing and time.monotonic() < deadline:
            time.sleep(recheck_interval)
            missing = log.missing_ids(gap)
        if missing:
            log.fill_noops(missing)

    log.listen_gaps(fill)
    return fill
