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
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Protocol


class CursorRegressionError(ValueError):
    """Attempt to move a cursor backwards (reference rsql/db.go:286-291)."""


class CursorStore(Protocol):
    def get_cursor(self, consumer: str) -> int: ...

    def set_cursor(self, consumer: str, cursor: int) -> None: ...

    def flush(self) -> None: ...


class MemCursorStore:
    """In-memory cursor store (reference rpatterns/cursor.go:70-119)."""

    def __init__(self, seed: dict[str, int] | None = None):
        self._cursors: dict[str, int] = dict(seed or {})

    def get_cursor(self, consumer: str) -> int:
        return self._cursors.get(consumer, 0)

    def set_cursor(self, consumer: str, cursor: int) -> None:
        if cursor < self._cursors.get(consumer, 0):
            raise CursorRegressionError(
                f"cursor regression for {consumer}: {self._cursors[consumer]} -> {cursor}"
            )
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

    def get_cursor(self, consumer: str) -> int:
        try:
            with open(self._file(consumer)) as f:
                return int(json.load(f)["cursor"])
        except FileNotFoundError:
            return 0

    def set_cursor(self, consumer: str, cursor: int) -> None:
        current = self.get_cursor(consumer)
        if cursor < current:
            raise CursorRegressionError(
                f"cursor regression for {consumer}: {current} -> {cursor}"
            )
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

    def get_cursor(self, consumer: str) -> int:
        c = self.primary.get_cursor(consumer)
        return c if c else self.fallback.get_cursor(consumer)

    def set_cursor(self, consumer: str, cursor: int) -> None:
        self.primary.set_cursor(consumer, cursor)

    def flush(self) -> None:
        self.primary.flush()
