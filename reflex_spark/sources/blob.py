"""Blob-bucket event source: ordered JSON blobs in a bucket/directory tree.

Reference parity (rblob/blob.go, rblob/doc.go): a bucket of lexicographically
ordered, immutable, append-only blobs (e.g. date-partitioned
`yyyy/mm/dd/Name-...` keys) streamed as individual JSON events. The
reference hand-rolls blob listing, a composite `key|len|offset` cursor and
per-record JSON decode; Spark's file streaming source already implements all
three (ordered file discovery, per-file ledger in the checkpoint, schema'd
JSON decode), so this module is a thin, typed wrapper.

S3/GCS note: the same code serves `s3a://bucket/prefix` paths when the
Hadoop S3 connector is on the classpath; tests use local directories which
share the exact file-source semantics.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class BlobChangedError(RuntimeError):
    """A blob shrank under a mid-blob cursor — blobs must be immutable
    (reference rblob/doc.go contract)."""


class BlobTruncatedError(RuntimeError):
    """A gzip blob's stream is provably truncated/corrupt (a mid-upload
    writer, typically): it must not be consumed this poll — the loop
    stops AT the key (ascending-key contract forbids skipping past it)
    and retries once the writer finishes.

    Detection boundary: the sizing probe decompresses at most
    POLL_WHOLETEXT_CAP+1 bytes, so truncation is only PROVABLE for
    blobs whose decompressed size is under the cap. A gzip truncated
    BEYOND the cap routes to the Spark line-reader (the right route for
    its size) and fails there as an executor-side read error rather
    than this typed stop — the poll loop still halts at the key, just
    with the generic failure. Verifying the tail would cost a full
    decompression of every over-cap blob per version; the cap exists
    to bound exactly that."""


@dataclass
class BlobCursor:
    """Composite mid-blob cursor, reference rblob/blob.go:367-416 parity.

    String form matches the reference exactly so cursors sort
    lexicographically (their monotonic-increase contract, and ours —
    the cursor stores' string guard):

    - ``key|NN|offset`` — NN is the zero-padded digit *count* of offset,
      so ``k|01|9`` < ``k|02|10`` < ``k|03|999`` (blob_internal_test.go
      TestCursor);
    - ``key|eof`` — blob fully consumed ("eof" sorts after any digits);
    - legacy ``key|offset`` accepted on parse (TestLegacyCursor).

    Offset unit: here it is the RECORD index within the blob (the
    reference tracks a byte offset into its JSON decoder; Spark reads are
    record-oriented, so records are the deterministic resume point).
    """

    key: str = ""
    offset: int = 0
    eof: bool = False

    def encode(self) -> str:
        if not self.key:
            return ""
        if self.eof:
            return f"{self.key}|eof"
        return f"{self.key}|{len(str(self.offset)):02d}|{self.offset}"

    @classmethod
    def decode(cls, raw) -> "BlobCursor":
        if not raw or raw == 0:
            return cls()
        parts = str(raw).split("|")
        if len(parts) >= 2 and parts[-1] == "eof":
            return cls(key="|".join(parts[:-1]), eof=True)
        if len(parts) >= 3:
            return cls(key="|".join(parts[:-2]), offset=int(parts[-1]))
        return cls(key=parts[0], offset=int(parts[1]))  # legacy key|offset


class BlobBucket:
    """A (possibly date-partitioned) directory of record blobs.

    ``fmt`` is the reference's pluggable Decoder (rblob/blob.go:21-42,
    ``WithDecoder``; default JSONDecoder) re-expressed Spark-first: the
    decode step is Spark's native line-record readers — ``"json"``
    (default) or ``"csv"`` (``options`` passes reader options through,
    e.g. header/sep) — so decoding stays JVM-side and parallel instead
    of a per-blob Python hook. Gzip needs no decoder at all: Spark's
    text-based sources decompress ``*.gz`` blobs transparently on every
    path (batch, streaming, and the mid-blob poll reader), matching the
    common Firehose-gzip bucket layout."""

    _FORMATS = ("json", "csv")

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        schema: StructType,
        fmt: str = "json",
        options: dict | None = None,
    ):
        if fmt not in self._FORMATS:
            raise ValueError(f"unsupported blob format {fmt!r}: {self._FORMATS}")
        self.spark = spark
        self.path = path
        self.schema = schema
        self.fmt = fmt
        self.options = dict(options or {})
        # (key, compressed_size, mtime_ns, cap) -> measured decompressed
        # size: the poll loop revisits the same blob every iteration, and
        # the bounded sizing decompression need only be paid once per
        # blob VERSION — mtime in the key means a rewrite with an
        # identical compressed byte count still re-measures (same-size
        # different-content collision), and the cap keys the truncation
        # point. Only MEASURED sizes are memoized: a transient open
        # error must not stick the blob on the fallback route forever
        self._gz_size_memo: dict[tuple[str, int, int, int], int] = {}

    def _schema_ddl(self) -> str:
        return ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in self.schema.fields
        )

    def read(self) -> DataFrame:
        """Batch scan of every record in the bucket (recursive)."""
        reader = (
            self.spark.read.schema(self.schema)
            .option("recursiveFileLookup", "true")
            .options(**self.options)
        )
        return getattr(reader, self.fmt)(self.path)

    def read_stream(self, max_files_per_trigger: int | None = None) -> DataFrame:
        """Streaming scan: the checkpoint's file ledger replaces the
        reference's `key|len|offset` cursor (rblob/blob.go:367-416);
        `latestFirst=false` (default) preserves lexicographic blob order.
        Empty blobs (present in the reference's fixtures) yield no rows and
        are committed like any other file."""
        reader = (
            self.spark.readStream.schema(self.schema)
            .option("recursiveFileLookup", "true")
            .option("latestFirst", "false")
            .options(**self.options)
        )
        if max_files_per_trigger:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return getattr(reader, self.fmt)(self.path)

    # -- mid-blob-resumable poll path --------------------------------------

    def list_blobs(self) -> list[tuple[str, int]]:
        """Lexicographically ordered (key, size) listing via the Hadoop
        FileSystem API — identical code path for file:// and s3a://."""
        jvm = self.spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(self.path)
        fs = jpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        if not fs.exists(jpath):
            return []
        it = fs.listFiles(jpath, True)
        out = []
        while it.hasNext():
            st = it.next()
            p = st.getPath().toUri().getPath()
            # skip job markers / hidden temps (_SUCCESS, .crc, dot-temps)
            # — the batch/stream file sources ignore them, and the poll
            # loop must see the same bucket contents they do
            if os.path.basename(p).startswith(("_", ".")):
                continue
            out.append((p, int(st.getLen())))
        return sorted(out)

    # Blobs up to this size take the JVM-side wholetext index route on
    # the poll path; larger ones fall back to the Python-RDD hop (see
    # read_blob_records). 128 MiB of text in one task row is comfortably
    # inside executor memory at the suite's settings.
    POLL_WHOLETEXT_CAP = 128 * 1024 * 1024

    def read_blob_records(self, key: str, size: int | None = None) -> DataFrame:
        """One blob's records with a stable in-file record index ``__idx``,
        parsed against the bucket schema. The per-blob scan is the unit of
        work here by design: the poll path consumes blob by blob like the
        reference's sequential decoder; read_stream is the
        all-blobs-parallel scale path.

        Text sources have no native row index, so the index is derived
        one of two ways: blobs under ``POLL_WHOLETEXT_CAP`` read as ONE
        ``wholetext`` row and split JVM-side (``posexplode`` supplies the
        in-file position — no Python in the path, at the documented cost
        of holding the blob in one task's memory); larger blobs fall back
        to the RDD ``zipWithIndex`` hop (a full Python serialization pass
        — acceptable only because oversized blobs on the POLL path are
        off-design: read_stream with its per-file ledger is where a 1 GB+
        blob belongs). ``size`` (bytes) routes the choice; when omitted
        it is fetched from the filesystem."""
        if size is None:
            sizes = dict(self.list_blobs())
            size = sizes.get(key)
        # the cap bounds the DECOMPRESSED text held in the one wholetext
        # row. The gzip ISIZE footer cannot be trusted for routing (it
        # records only the LAST member's size mod 2^32, so Firehose-style
        # concatenated blobs and >=4 GiB members under-report), so local
        # gzip blobs are sized by BOUNDED stream-decompression: read at
        # most cap+1 decompressed bytes — exact below the cap, and "over"
        # is all the router needs above it. Cost is O(min(size, cap))
        # decompress ONCE per blob version — the result is memoized on
        # (key, compressed size, cap), so a poll loop revisiting the blob
        # every iteration does not re-pay it. Where the blob isn't
        # locally openable (remote stores), the true decompressed size
        # cannot be probed — fail SAFE to the line-reader fallback: an
        # assumed compression ratio can under-estimate highly repetitive
        # text below the cap and OOM the single wholetext task.
        if size is not None and key.endswith(".gz"):
            import gzip as _gzip

            try:
                mtime_ns = os.stat(key).st_mtime_ns
                memo_key = (key, size, mtime_ns, self.POLL_WHOLETEXT_CAP)
            except OSError:
                memo_key = None  # not locally statable: never memoize
            cached = (
                self._gz_size_memo.get(memo_key) if memo_key else None
            )
            if cached is not None:
                size = cached
            else:
                import zlib as _zlib

                try:
                    n = 0
                    with _gzip.open(key, "rb") as g:
                        while n <= self.POLL_WHOLETEXT_CAP:
                            chunk = g.read(1 << 20)
                            if not chunk:
                                break
                            n += len(chunk)
                    size = n
                    if memo_key is not None:
                        if len(self._gz_size_memo) > 65536:
                            self._gz_size_memo.clear()
                        self._gz_size_memo[memo_key] = n
                except (EOFError, _zlib.error, _gzip.BadGzipFile) as e:
                    # the bytes are locally readable and PROVABLY
                    # truncated/corrupt (mid-upload writer): any route
                    # — wholetext or line-reader — would crash on the
                    # same bytes inside the Spark read, so surface a
                    # typed error the poll loop can stop on instead of
                    # merely relocating the crash to an executor.
                    # BadGzipFile (bad magic/CRC/ISIZE) must be listed
                    # HERE: it subclasses OSError, so without it the
                    # clause below would misroute locally-readable
                    # corruption to the line reader (ADVICE r15)
                    raise BlobTruncatedError(
                        f"{key}: gzip stream is truncated or corrupt "
                        f"(mid-upload writer?): {e}"
                    ) from e
                except OSError:
                    # not openable locally (remote store / transient
                    # error): Spark's own reader handles the bytes —
                    # fail safe to the line-reader fallback, UNCACHED,
                    # so the blob re-measures next poll
                    size = self.POLL_WHOLETEXT_CAP + 1
        if size is not None and size <= self.POLL_WHOLETEXT_CAP:
            # NB: wholetext must be the .text() kwarg — the method's own
            # default overrides a reader-level .option("wholetext", ...)
            whole = self.spark.read.text(key, wholetext=True)
            # split on the SAME terminators Hadoop's LineRecordReader
            # recognizes (\r\n, \r, \n) so records and indices are
            # identical to the >cap line-reader fallback; drop ONLY the
            # artifact empty element a trailing terminator leaves
            # (interior empty lines keep their index)
            trimmed = F.expr(
                "slice(__l, 1, size(__l) - IF(element_at(__l, -1) = '', 1, 0))"
            )
            df = (
                whole.select(
                    F.split(F.col("value"), "\r\n|\r|\n").alias("__l")
                )
                .select(trimmed.alias("__l"))
                .select(F.posexplode(F.col("__l")).alias("__idx", "value"))
                .select(F.col("__idx").cast("long").alias("__idx"), "value")
            )
        else:
            indexed = (
                self.spark.read.text(key)
                .rdd.zipWithIndex()
                .map(lambda t: (t[0]["value"], t[1]))
            )
            df = self.spark.createDataFrame(indexed, "value string, __idx long")
        opts = dict(self.options)
        if self.fmt == "csv" and str(opts.pop("header", "false")).lower() == "true":
            # from_csv has no header concept: drop each blob's first line
            # and re-base __idx so RECORD offsets match the batch/stream
            # views — otherwise the header would arrive as a garbage
            # record and every mid-blob cursor would be off by one.
            df = df.where(F.col("__idx") > 0).select(
                (F.col("__idx") - 1).alias("__idx"), "value"
            )
        parse = (
            F.from_json("value", self.schema)
            if self.fmt == "json"
            else F.from_csv("value", self._schema_ddl(), opts)
        )
        return df.select(parse.alias("__r"), "__idx").select("__r.*", "__idx")


def run_blobs(
    bucket: BlobBucket,
    cstore,
    consumer,
    records_per_batch: int = 1000,
    to_head: bool = True,
    poll_backoff: float = 0.2,
    max_loops: int | None = None,
) -> str:
    """Poll loop over a blob bucket with MID-BLOB resume (reference
    rblob/blob.go:367-416): the cursor is ``key|NN|offset`` and advances
    every ``records_per_batch`` records, so a consumer crashing inside a
    large blob redelivers only the current chunk — not the whole blob
    (round-1 gap: file-granularity cursors made redelivery amplitude the
    blob size).

    At-least-once like run(): the cursor commits only after consume
    returns. A shrunken blob under a mid-blob cursor raises
    BlobChangedError (blobs are immutable by contract); keys sorting
    before the cursor are skipped (lexicographic-order contract,
    rblob/doc.go).

    Truncated-gzip handling: a mid-upload .gz whose decompressed size
    is under POLL_WHOLETEXT_CAP raises the typed BlobTruncatedError and
    the loop stops AT the key; one truncated BEYOND the cap is outside
    the sizing probe's proof boundary (see BlobTruncatedError) and
    fails as a generic executor read error instead — same halt-at-key
    outcome, weaker typing.
    """
    from reflex_spark.streaming.run import ErrHeadReached

    name = consumer.name
    loops = 0
    while True:
        cur = BlobCursor.decode(cstore.get_cursor(name))
        progressed = False
        for key, size in bucket.list_blobs():
            if key < cur.key or (key == cur.key and cur.eof):
                continue
            start = cur.offset if key == cur.key else 0
            try:
                recs = bucket.read_blob_records(key, size=size).cache()
            except BlobTruncatedError:
                # a mid-upload blob: consuming LATER keys first would
                # break the ascending-cursor contract, so stop AT this
                # key for this iteration and retry next poll (to_head
                # catch-up runs cannot proceed past it — surface it)
                if to_head:
                    raise
                break
            try:
                total = recs.count()
                if start > total:
                    raise BlobChangedError(
                        f"{key}: cursor offset {start} beyond {total} records "
                        f"(size now {size}); blobs must be immutable"
                    )
                off = start
                while off < total:
                    hi = min(off + records_per_batch, total)
                    chunk = recs.where(
                        (F.col("__idx") >= off) & (F.col("__idx") < hi)
                    ).drop("__idx")
                    consumer.consume(chunk, {"key": key, "offset": off})
                    consumer.stats["events"] += hi - off
                    off = hi
                    cstore.set_cursor(
                        name, BlobCursor(key=key, offset=off).encode()
                    )
                    progressed = True
                # blob exhausted (incl. empty blobs): commit the eof marker,
                # which sorts after every offset form of the same key
                cstore.set_cursor(name, BlobCursor(key=key, eof=True).encode())
            finally:
                recs.unpersist()
            cur = BlobCursor.decode(cstore.get_cursor(name))
        if to_head:
            raise ErrHeadReached(f"{name} reached blob head at {cur.encode()!r}")
        loops += 1
        if max_loops is not None and loops >= max_loops:
            return cur.encode()
        if not progressed:
            time.sleep(poll_backoff)
