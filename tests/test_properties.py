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


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),  # height in 8px blocks
            st.integers(min_value=1, max_value=4),  # width in 8px blocks
            st.integers(min_value=0, max_value=255),  # base gray value
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=60),
)
@settings(max_examples=30, deadline=None)
def test_avi_mjpeg_roundtrip_any_frames(frame_specs, fps):
    """Container property: for ANY frame list (varying counts, odd/even
    JPEG byte lengths, any fps), mux→demux returns the exact input
    bytes and the header dimensions/count — frames must share one size
    per stream, so the first spec fixes it."""
    import numpy as np

    from reflex_spark.functions.codecs import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
        encode_jpeg,
    )

    hb, wb, _ = frame_specs[0]
    frames = [
        encode_jpeg(np.full((hb * 8, wb * 8), v, dtype=np.uint8), quality=75)
        for (_, _, v) in frame_specs
    ]
    avi = encode_avi_mjpeg(frames, wb * 8, hb * 8, fps=fps)
    w, h, out = decode_avi_mjpeg(avi)
    assert (w, h) == (wb * 8, hb * 8)
    assert out == frames


@given(
    st.lists(
        st.text(alphabet="abc", min_size=1, max_size=8),
        min_size=1,
        max_size=12,
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=25, deadline=None)
def test_bpe_wrapped_replace_equals_reference_merge(words, n_merges):
    """The wrapped-string replace() merge must equal the reference
    left-to-right non-overlapping BPE merge for ANY corpus over a tiny
    alphabet (maximizing overlap cases like 'aaaa') and any merge count.
    Pure-Python check of the same string transform both engines run."""
    from collections import Counter

    freqs = Counter(words)
    vocab = {w: list(w) for w in freqs}

    def wrapped(sym_seq):
        return "(" + ")(".join(sym_seq) + ")"

    wstate = {w: wrapped(vocab[w]) for w in vocab}
    for _ in range(n_merges):
        stats: Counter = Counter()
        for w, f in freqs.items():
            s = vocab[w]
            for i in range(len(s) - 1):
                stats[(s[i], s[i + 1])] += f
        if not stats:
            break
        (a, b), _cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        # reference merge: left-to-right, non-overlapping
        for w in vocab:
            s, out, i = vocab[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[w] = out
        # the engine's transform: plain str.replace (leftmost,
        # non-overlapping — same semantics as Spark/DuckDB replace())
        for w in wstate:
            wstate[w] = wstate[w].replace(f"({a})({b})", f"({a}{b})")
    for w in vocab:
        assert wstate[w] == wrapped(vocab[w]), (w, wstate[w], vocab[w])


@given(
    st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=999_998).map(
                lambda s: f"data/w-{s:06d}-part-00000.jsonl"
            ),
            st.integers(min_value=0, max_value=99).map(
                lambda p: f"data/part-{p:05d}.jsonl"  # legacy write-0 names
            ),
        ),
        max_size=30,
    )
)
@settings(max_examples=200)
def test_blob_next_seq_always_sorts_after_existing(keys):
    """The append-namespacing invariant: whatever mix of legacy and
    w-<seq> blob keys a bucket holds, the next write's keys must sort
    lexicographically strictly AFTER every existing key — the bucket's
    ascending-key cursor contract across producer runs. (This property
    test originally falsified the implementation: a malformed w- key
    sorts after every numeric seq, so _next_seq now REFUSES such
    buckets instead of silently breaking ordering.)"""
    from reflex_spark.sources.blob_datasource import ReflexBlobWriter

    seq = ReflexBlobWriter._next_seq(sorted(set(keys)))
    new_key = f"data/w-{seq:06d}-part-00000.jsonl"
    for k in set(keys):
        assert new_key > k, (seq, k)


def test_blob_next_seq_refuses_unorderable_buckets():
    from pytest import raises

    from reflex_spark.sources.blob_datasource import ReflexBlobWriter

    with raises(ValueError, match="non-writer"):
        ReflexBlobWriter._next_seq(["data/w-garbage.jsonl"])
    with raises(ValueError, match="non-writer"):
        ReflexBlobWriter._next_seq(["data/w-12345-part-00000.jsonl"])  # 5 digits
    with raises(ValueError, match="exhausted"):
        ReflexBlobWriter._next_seq(["data/w-999999-part-00000.jsonl"])
