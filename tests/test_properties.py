"""Property-based tests (hypothesis) for the pure-python contracts."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from reflex_spark.functions.tracing import SpanContext, marshal, unmarshal
from reflex_spark.streaming.cursors import (
    CursorRegressionError,
    FileCursorStore,
    MemCursorStore,
    ReadThroughCursorStore,
)


@given(st.binary(min_size=16, max_size=16), st.binary(min_size=8, max_size=8))
def test_trace_roundtrip_any_ids(trace_id, span_id):
    ctx = SpanContext(trace_id, span_id)
    assert unmarshal(marshal(ctx)) == ctx


@given(st.binary(max_size=64))
def test_unmarshal_never_raises(raw):
    # undecodable traces are ignored, not fatal (reference behavior)
    out = unmarshal(raw)
    assert out is None or isinstance(out, SpanContext)


@given(st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=50))
@settings(max_examples=50)
def test_cursor_store_is_monotonic_under_any_sequence(updates):
    """Whatever sequence of set_cursor calls arrives, the stored cursor is
    the running maximum of the accepted prefix — never regresses."""
    store = MemCursorStore()
    high = 0
    for u in updates:
        try:
            store.set_cursor("c", u)
            assert u >= high
            high = u
        except CursorRegressionError:
            assert u < high
        assert store.get_cursor("c") == high


@given(
    st.integers(min_value=0, max_value=100),
    st.integers(min_value=0, max_value=100),
)
@settings(max_examples=30)
def test_read_through_prefers_primary_when_set(primary_val, fallback_val):
    primary = MemCursorStore({"c": primary_val} if primary_val else None)
    fallback = MemCursorStore({"c": fallback_val})
    store = ReadThroughCursorStore(primary, fallback)
    expected = primary_val if primary_val else fallback_val
    assert store.get_cursor("c") == expected


@given(st.lists(st.integers(min_value=0, max_value=1_000), min_size=1, max_size=20))
@settings(max_examples=20)
def test_file_cursor_store_equivalent_to_mem(tmp_path_factory, updates):
    fs = FileCursorStore(str(tmp_path_factory.mktemp("cur")))
    mem = MemCursorStore()
    for u in updates:
        fs_err = mem_err = False
        try:
            fs.set_cursor("c", u)
        except CursorRegressionError:
            fs_err = True
        try:
            mem.set_cursor("c", u)
        except CursorRegressionError:
            mem_err = True
        assert fs_err == mem_err
        assert fs.get_cursor("c") == mem.get_cursor("c")


def test_string_cursor_store_support(tmp_path):
    """WithCursorStrings parity: lexicographic monotonic guard, type-mix
    rejection, persistence."""
    import pytest

    from reflex_spark.streaming.cursors import FileCursorStore, MemCursorStore

    for store in (MemCursorStore(), FileCursorStore(str(tmp_path / "c"))):
        store.set_cursor("s", "2024/01/01|10|3")
        store.set_cursor("s", "2024/01/02|5|0")  # lexicographically later
        with pytest.raises(CursorRegressionError):
            store.set_cursor("s", "2023/12/31|1|0")
        with pytest.raises(CursorRegressionError):
            store.set_cursor("s", 5)  # type change rejected
        assert store.get_cursor("s") == "2024/01/02|5|0"
