"""Cursor stores: per-consumer offsets (reference api.go:169-179).

Parity notes:
- Monotonic guard — a cursor set-back is rejected, mirroring the MySQL
  store's `WHERE cursor < ?` update + dup-key regression error
  (rsql/db.go:265-291).
- FileCursorStore persists via atomic rename (crash-safe like the
  reference's SQL txn); the async 5s flush buffer (rsql/cursorstable.go)
  is deliberately absent — each set is durable, matching Spark's
  commit-per-microbatch model (SURVEY.md §4).
- MemCursorStore mirrors rpatterns/cursor.go:70-119 (tests/seeding).
- ReadThroughCursorStore mirrors rpatterns/cursor.go:22-62 (migration).
- Cursors are int by default but stores also accept strings
  (WithCursorStrings, rsql/cursorstable.go:17-44): the monotonic guard
  compares values of whichever type is stored — mixing types for one
  consumer raises, mirroring the MySQL string/int comparison hazard note
  (rsql/db.go:259-261).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Protocol


class CursorRegressionError(ValueError):
    """Attempt to move a cursor backwards (reference rsql/db.go:286-291)."""


Cursor = int | str


def _check_monotonic(consumer: str, current: Cursor, new: Cursor) -> None:
    if isinstance(current, int) and current == 0:
        return  # unset
    if type(current) is not type(new):
        raise CursorRegressionError(
            f"cursor type change for {consumer}: {type(current).__name__} -> {type(new).__name__}"
        )
    if new < current:  # int or lexicographic string compare
        raise CursorRegressionError(
            f"cursor regression for {consumer}: {current!r} -> {new!r}"
        )


class CursorStore(Protocol):
    def get_cursor(self, consumer: str) -> Cursor: ...

    def set_cursor(self, consumer: str, cursor: Cursor) -> None: ...

    def flush(self) -> None: ...


class MemCursorStore:
    """In-memory cursor store (reference rpatterns/cursor.go:70-119)."""

    def __init__(self, seed: dict[str, Cursor] | None = None):
        self._cursors: dict[str, Cursor] = dict(seed or {})

    def get_cursor(self, consumer: str) -> Cursor:
        return self._cursors.get(consumer, 0)

    def set_cursor(self, consumer: str, cursor: Cursor) -> None:
        _check_monotonic(consumer, self._cursors.get(consumer, 0), cursor)
        self._cursors[consumer] = cursor

    def flush(self) -> None:
        pass


class FileCursorStore:
    """Durable cursor store: one JSON file per consumer, atomic rename."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def _file(self, consumer: str) -> str:
        safe = consumer.replace("/", "_")
        return os.path.join(self.path, f"{safe}.json")

    def get_cursor(self, consumer: str) -> Cursor:
        try:
            with open(self._file(consumer)) as f:
                return json.load(f)["cursor"]
        except FileNotFoundError:
            return 0

    def set_cursor(self, consumer: str, cursor: Cursor) -> None:
        current = self.get_cursor(consumer)
        _check_monotonic(consumer, current, cursor)
        fd, tmp = tempfile.mkstemp(dir=self.path)
        with os.fdopen(fd, "w") as f:
            json.dump({"cursor": cursor}, f)
        os.replace(tmp, self._file(consumer))

    def flush(self) -> None:
        pass


class ReadThroughCursorStore:
    """Primary/fallback chain for cursor migration or seeding
    (reference rpatterns/cursor.go:22-62): reads hit the primary; a miss
    falls back; writes always go to the primary."""

    def __init__(self, primary: CursorStore, fallback: CursorStore):
        self.primary = primary
        self.fallback = fallback

    def get_cursor(self, consumer: str) -> Cursor:
        c = self.primary.get_cursor(consumer)
        return c if c else self.fallback.get_cursor(consumer)

    def set_cursor(self, consumer: str, cursor: Cursor) -> None:
        self.primary.set_cursor(consumer, cursor)

    def flush(self) -> None:
        self.primary.flush()
