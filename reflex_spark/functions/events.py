"""Event-type predicates (reference IsType/IsAnyType, api.go:51-64) and
filter combinators (reference filters/combine.go, filters/metadata.go)."""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

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


def all_filters(*preds: Column) -> Column:
    """filters.AllEventFilters (filters/combine.go:8-19): true iff every
    predicate is true. Short-circuit order is preserved left-to-right."""
    return reduce(lambda a, b: a & b, preds)


def any_filters(*preds: Column) -> Column:
    """filters.AnyEventFilters (filters/combine.go:21-37): true iff any
    predicate is true."""
    return reduce(lambda a, b: a | b, preds)


def metadata_filter(
    metadata: Column | str,
    schema: str,
    pred: Callable[[Column], Column],
    strict: bool = True,
) -> Column:
    """filters.MetadataEventFilter (filters/metadata.go:28-43): deserialize
    the opaque metadata payload (JSON bytes -> ``schema``) and apply a
    predicate to the parsed struct.

    ``strict=True`` mirrors the reference's deserialization-error contract
    (IsDeserializationErr, filters/metadata.go:46-48): a non-null payload
    that fails to parse raises at execution time (FAILFAST parse mode),
    killing the consumer fail-fast, instead of being silently dropped.
    Null payloads filter to false (nothing to match), matching a
    nil-Metadata event.
    """
    m = F.col(metadata) if isinstance(metadata, str) else metadata
    options = {"mode": "FAILFAST"} if strict else None
    parsed = F.from_json(m.cast("string"), schema, options)
    return m.isNotNull() & F.coalesce(pred(parsed), F.lit(False))
