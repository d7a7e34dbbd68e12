"""Event-type predicates (reference IsType/IsAnyType, api.go:51-64)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def is_type(event_type: Column | str, t: int) -> Column:
    """reflex.IsType: exact event-type match (api.go:51-56)."""
    c = F.col(event_type) if isinstance(event_type, str) else event_type
    return c == F.lit(t)


def is_any_type(event_type: Column | str, *types: int) -> Column:
    """reflex.IsAnyType: membership in a type set (api.go:58-64)."""
    c = F.col(event_type) if isinstance(event_type, str) else event_type
    return c.isin(list(types))
