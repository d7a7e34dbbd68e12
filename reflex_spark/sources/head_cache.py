"""HeadCache: read-through cache of the hot head window of an event log.

Reference parity (G3): rsql/rcache.go — N consumers tailing the same log
each issue an identical head-window load; the cache serves all of them
from one load. The reference caps the cache at 10k events
(defaultRCacheLimit), validates that loaded ids are consecutive
(ErrConsecEvent), and re-initializes rather than bridging a gap.

Spark translation — the data path stays distributed: the cached window is
a Spark-cached DataFrame (executor memory); the driver holds only the
``(lo, hi)`` id-range bookkeeping. A hit serves ``event_id > cursor`` off
the cached blocks — zero storage LIST + scan, which at 100 TB is the
whole cost of a head poll. One deliberate divergence from the reference:
on a miss the window is *replaced*, not extended-and-trimmed row by row
(extending a cached DataFrame would re-cache the union's blocks and
double memory). Same bounded-memory guarantee, same hit condition for
any consumer within one window of head; a consumer more than ``limit``
events behind misses in both designs.

Cache integrity: read-through always loads with ``dense_only=True``, so a
cached window never contains an id hole — a hit can never serve rows
from beyond a gap, and after a gap fill the next poll (cursor at the
dense head, wanted id past the cached hi) misses and reloads. That is
the file-log equivalent of rcache's consecutive-id sanity check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ErrConsecEvent(Exception):
    """Loaded window ids are not consecutive (reference ErrConsecEvent,
    rsql/rcache.go readThrough sanity check)."""


class HeadCache:
    """Drop-in wrapper for any EventLog-shaped source: pass
    ``HeadCache(log)`` wherever a Spec takes a log.

    ``disabled`` mirrors the reference's global DisableCache switch: all
    loads go straight through to the underlying log.
    """

    DEFAULT_LIMIT = 10_000  # reference defaultRCacheLimit (rcache.go:13)

    disabled = False

    def __init__(self, log, limit: int | None = None):
        self.log = log
        self.limit = limit or self.DEFAULT_LIMIT
        self.hits = 0
        self.misses = 0
        self._df: DataFrame | None = None
        self._lo = 0  # cached id range, inclusive; meaningless when _df is None
        self._hi = 0

    # -- log surface passthrough ------------------------------------------

    def head(self) -> int:
        return self.log.head()

    def read(self) -> DataFrame:
        return self.log.read()

    def read_stream(self, **kwargs) -> DataFrame:
        return self.log.read_stream(**kwargs)

    def append(self, events: DataFrame) -> int:
        return self.log.append(events)

    @property
    def notifier(self):
        return getattr(self.log, "notifier", None)

    def detect_gap(self, after: int):
        return self.log.detect_gap(after)

    def emit_gap(self, gap) -> None:
        self.log.emit_gap(gap)

    @property
    def _gap_listeners(self):
        return getattr(self.log, "_gap_listeners", [])

    # -- cache core --------------------------------------------------------

    def invalidate(self) -> None:
        if self._df is not None:
            self._df.unpersist()
            self._df = None

    def read_after(
        self, after: int, limit: int | None = None, dense_only: bool = False
    ) -> DataFrame:
        """Serve the id window after ``after`` from cache when it lies
        inside the cached range (reference maybeHit, rcache.go:83-115:
        hit iff ``from`` ∈ [head, tail]; the client re-calls for rows past
        the tail and that call reads through, advancing the cache)."""
        want = after + 1
        if (
            not HeadCache.disabled
            and self._df is not None
            and self._lo <= want <= self._hi
        ):
            self.hits += 1
            df = self._df.where(F.col("event_id") > after)
            # orderBy before limit so a limited hit is always the lowest-id
            # prefix of the dense cached window — without it, limit() may
            # take an arbitrary subset across partitions, and a dense_only
            # caller (the run loop's gap fallback re-enters this same hit
            # path) would silently advance past skipped rows.
            return df.orderBy("event_id").limit(limit) if limit else df
        self.misses += 1
        return self._read_through(after, limit)

    def _read_through(self, after: int, limit: int | None) -> DataFrame:
        """Load a full cache window (not just the caller's batch) so that
        followers hit (reference readThrough, rcache.go:117-152).

        The plain (non-dense) plan is tried first — a window with unique
        ids > after is consecutive iff ``hi == after + n``, checked from
        the same agg that does the bookkeeping — so the log's dense
        truncation (an unpartitioned row_number window) is paid only when
        a hole is actually present."""
        window = max(limit or 0, self.limit)
        fresh = self.log.read_after(after, window, dense_only=False)
        if HeadCache.disabled:
            return fresh.limit(limit) if limit else fresh

        def load_stats(df):
            df = df.cache()
            r = df.agg(
                F.min("event_id").alias("lo"),
                F.max("event_id").alias("hi"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]
            return df, r["lo"], r["hi"], r["n"]

        fresh, lo, hi, n = load_stats(fresh)
        if n and (lo != after + 1 or n != hi - lo + 1):
            # hole in the window: retruncate to the contiguous prefix
            fresh.unpersist()
            fresh, lo, hi, n = load_stats(
                self.log.read_after(after, window, dense_only=True)
            )
        if n == 0:
            fresh.unpersist()
            return fresh
        if lo != after + 1 or n != hi - lo + 1:
            # the log's dense_only contract is violated (custom log): fail
            # loudly rather than cache a window with holes (reference
            # ErrConsecEvent).
            fresh.unpersist()
            raise ErrConsecEvent(f"non-consecutive window after {after}: [{lo},{hi}] n={n}")
        self.invalidate()
        self._df, self._lo, self._hi = fresh, lo, hi
        return fresh.limit(limit) if limit else fresh
