"""Multimodal columns: opaque binary payloads + typed metadata, processed
via Arrow-batched mapInPandas (north-star extension).

Model: a modality column is `payload: binary` plus a metadata struct
(mime, width/height/duration, etc.) — the same opaque-bytes shape as the
reference's Event.MetaData (api.go:17). All Spark-side plumbing (schema,
batch iteration, partition parallelism) is real and tested, and so are
the codecs for the three formats decodable without binary wheels: PNG
(from-scratch zlib+numpy decoder/encoder), JPEG — baseline AND
progressive since round 4 (from-scratch huffman + IDCT, spectral
selection / successive approximation) — and 16-bit PCM WAV (stdlib wave);
see functions/codecs.py — plus, since round 8, MJPEG-in-AVI video via a
from-scratch RIFF container walk over the JPEG codec. Unsupported formats
(arithmetic JPEG, MP3, non-MJPEG video codecs)
raise NotImplementedError naming the format; `fake=True` substitutes the
round-1 deterministic pseudo-codec so pipeline shape can be exercised
with arbitrary bytes.

Scale posture: payloads never pass through the driver; mapInPandas streams
Arrow record batches executor-side, so the pipeline is bounded by
`spark.sql.execution.arrow.maxRecordsPerBatch` × mean payload size per
task — tune both for large blobs, and store payloads in the lake with the
metadata columns leading so pruning can skip bytes when only metadata is
queried.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def with_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: materialize an opaque binary payload column (the
    fixtures carry no real media, so bytes come from the text column)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def spread_cpu(df: DataFrame, sweet_spot: int = 16) -> DataFrame:
    """Spread a codec stage's FEED across tasks (guide §2/§4: per-task
    work). The from-scratch codecs are CPU-bound per-row Python; a narrow
    feed — a single-file scan, or a small shuffle AQE coalesced to one
    partition — runs the whole corpus through one Python worker
    (measured at sf0.1: the MJPEG/AVI stats entry spent 6.7s serial in 1
    task vs 1.3s spread over 16). Repartitioning happens on the SMALL
    pre-payload rows (ids + integer grids), so the exchange moves KBs and
    the heavy payloads are born distributed; per-row results make the
    output partitioning-invariant. Sweet spot 16 measured for codec work
    (8: 1.6s, 16: 1.3s, 32: 2.0s) vs dedup._spread_target's 8 for
    cheaper shingle hashing; the same estimate-driven growth applies at
    scale.

    ONLY for exchange-free feeds (a scan + projections): the partition
    probe goes through ``df.rdd``, and on a post-shuffle plan that forces
    AQE to execute every upstream stage eagerly — the probe would cost
    more than the spread saves (measured on the image-render path:
    1.3s -> 3.5s). Shuffled feeds already carry the session's shuffle
    partitioning."""
    from reflex_spark.operators.dedup import _spread_target

    target = _spread_target(df, sweet_spot=sweet_spot)
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target)
    return df


def decode_image(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Decode image payloads to (id, width, height, mean_luma).

    Real codecs: PNG (depth-8 gray/RGB/RGBA) and JPEG — baseline SOF0
    and progressive SOF2 (gray + YCbCr, any sampling factors) via the from-scratch
    stdlib+numpy decoders in functions/codecs.py — no PIL needed. An
    unsupported format raises NotImplementedError from the executor task
    (surfacing the failing payload's format). ``fake=True`` keeps the
    round-1 deterministic pseudo-decode for pipeline-shape tests with
    arbitrary bytes.
    """
    import pandas as pd

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("mean_luma", IntegerType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from reflex_spark.functions.codecs import decode_image_bytes, luma

        for pdf in batches:
            payloads = pdf[payload_col]
            if fake:
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "width": payloads.map(lambda b: 16 + len(b) % 64),
                        "height": payloads.map(lambda b: 16 + (len(b) // 64) % 64),
                        "mean_luma": payloads.map(lambda b: sum(b[:32]) % 256 if len(b) else 0),
                    }
                )
                continue
            widths, heights, lumas = [], [], []
            for b in payloads:
                arr = decode_image_bytes(b)
                widths.append(arr.shape[1])
                heights.append(arr.shape[0])
                lumas.append(int(round(float(luma(arr).mean()))))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "width": widths, "height": heights, "mean_luma": lumas}
            )

    return df.select(id_col, payload_col).mapInPandas(decode, out_schema)


def frame_sample(
    df: DataFrame,
    every_nth: int = 10,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame sampling shape: one row per sampled frame offset.

    The split step is a deterministic chunker (real frame extraction needs
    a codec); the explode/partition shape is what matters at scale — frames
    fan out executor-side, never via the driver.
    """
    chunks = F.expr(
        f"transform(sequence(0, greatest(int(octet_length({payload_col}) / {every_nth}) - 1, 0)), "
        f"i -> struct(i as frame_idx, substring({payload_col}, i * {every_nth} + 1, {every_nth}) as frame_bytes))"
    )
    return df.select(id_col, F.explode(chunks).alias("frame")).select(
        id_col,
        F.col("frame.frame_idx").alias("frame_idx"),
        F.col("frame.frame_bytes").alias("frame_bytes"),
    )


def animation_frames(
    df: DataFrame,
    every_nth: int = 1,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL frame extraction for animated payloads (GIF, round 4): decode
    frames executor-side, emit every Nth composed frame re-encoded as PNG
    bytes -> (id, frame_idx, width, height, frame_png).

    This replaces the byte-chunker shape of ``frame_sample`` with an
    actual codec for the one animated format decodable without binary
    wheels; the explode/partition shape is identical (frames fan out
    executor-side via mapInPandas — payloads never transit the driver).
    """
    import pandas as pd

    out_schema = (
        f"{id_col} long, frame_idx int, width int, height int, frame_png binary"
    )

    def explode_frames(batches):
        from reflex_spark.functions.codecs import decode_gif_frames, encode_png

        for pdf in batches:
            ids, idxs, ws, hs, pngs = [], [], [], [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                frames = decode_gif_frames(bytes(payload))
                for i in range(0, len(frames), every_nth):
                    arr = frames[i]
                    ids.append(did)
                    idxs.append(i)
                    hs.append(arr.shape[0])
                    ws.append(arr.shape[1])
                    pngs.append(encode_png(arr))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "frame_png": pngs,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(explode_frames, out_schema)


def resize_image(
    df: DataFrame,
    target_w: int,
    target_h: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Resize: (id, payload) -> (id, resized payload, width, height).

    Real codec: PNG decode → deterministic nearest-neighbor resample →
    PNG re-encode, all executor-side (functions/codecs.py). ``fake=True``
    keeps the round-1 pseudo-resize (byte budget scaled by area ratio) for
    pipeline-shape tests with arbitrary bytes. Payload bytes round-trip
    through Arrow without driver involvement either way.
    """
    import pandas as pd
    from pyspark.sql.types import BinaryType

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from reflex_spark.functions.codecs import (
            decode_image_bytes,
            encode_png,
            resize_nearest,
        )

        def pseudo(b: bytes) -> bytes:
            if not b:
                return b
            src_area = (16 + len(b) % 64) * (16 + (len(b) // 64) % 64)
            n = max(1, int(len(b) * (target_w * target_h) / src_area))
            reps = (n + len(b) - 1) // len(b)
            return (b * reps)[:n]

        def real(b: bytes) -> bytes:
            # JPEG inputs accepted too; output is always PNG (lossless,
            # deterministic) so resized payloads hash stably.
            return encode_png(resize_nearest(decode_image_bytes(b), target_w, target_h))

        fn = pseudo if fake else real
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "payload": pdf[payload_col].map(fn),
                    "width": target_w,
                    "height": target_h,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, out_schema)


DHASH_ROWS = 6
DHASH_COLS = 11  # 66 buckets; 6 rows x 10 horizontal comparisons = 60 bits


def render_shingle_images(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rows: int = DHASH_ROWS,
    cols: int = DHASH_COLS,
) -> DataFrame:
    """Render each document as a deterministic grayscale image: a
    rows×cols grid whose pixel (r, c) is the count of the doc's DISTINCT
    word-3-shingles hashing (md5, first 15 hex → long) into bucket
    r*cols + c, mod 256 — a visual bag-of-shingles. Near-duplicate texts
    differ in a few shingles, so their renders differ in a few pixels;
    unrelated documents get unrelated histograms (unigram grids do NOT
    work — a shared vocabulary makes every doc's histogram look alike,
    measured 41k false pairs over 500 docs vs ~30 true ones).

    Returns (id, pxmap: array<int> of rows*cols, payload: PNG binary).
    The bucket counting is pure JVM (explode → md5 → one groupBy — the
    same shuffle shape as the MinHash signature stage); only the PNG
    encode crosses into Python, Arrow-batched. At 100 TB this is one
    narrow shuffle on (id, bucket) + one Arrow stage over rows*cols-byte
    grids — payload size is CONSTANT per doc regardless of text length.
    """
    import pandas as pd

    from reflex_spark.operators.dedup import shingle_rows

    total = rows * cols
    sh = shingle_rows(df, id_col, text_col, 3)
    bucket = (
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long") % total
    ).alias("bucket")
    px = (
        sh.select(F.col(id_col), bucket)
        .groupBy(id_col, "bucket")
        .agg((F.count(F.lit(1)) % 256).cast("int").alias("p"))
    )
    grids = px.groupBy(id_col).agg(
        F.map_from_entries(F.collect_list(F.struct("bucket", "p"))).alias("__pxm")
    )
    # docs with <3 words have no shingles: all-zero image (left join + fill)
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(total - 1)),
        lambda i: F.coalesce(F.element_at(F.col("__pxm"), i.cast("long")), F.lit(0)),
    )
    # NOT spread_cpu here: the feed is post-shuffle, so the partition
    # probe would force AQE to execute the whole upstream plan twice
    # (measured: 1.3s -> 3.5s), and the PNG encode over 66-byte grids is
    # sub-second even serial — the probe costs more than it saves.
    grid = (
        df.select(id_col)
        .distinct()
        .join(grids, id_col, "left")
        .select(F.col(id_col), dense.alias("pxmap"))
    )

    out_schema = f"{id_col} long, pxmap array<int>, payload binary"

    def encode(batches):
        import numpy as np

        from reflex_spark.functions.codecs import encode_png

        for pdf in batches:
            payloads = []
            for arr in pdf["pxmap"]:
                a = np.asarray(list(arr), dtype=np.uint8).reshape(rows, cols)
                payloads.append(encode_png(a[:, :, None]))
            yield pd.DataFrame(
                {id_col: pdf[id_col], "pxmap": pdf["pxmap"], "payload": payloads}
            )

    return grid.mapInPandas(encode, out_schema)


def image_dhash_signatures(
    images: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    rows: int = DHASH_ROWS,
    cols: int = DHASH_COLS,
) -> DataFrame:
    """dHash (difference hash) over DECODED image payloads → (id, sh):
    bit r*(cols-1)+c is set when pixel (r, c) > pixel (r, c+1); the
    60-bit fingerprint (6×10 comparisons stays inside a signed long,
    like the SimHash layout) is emitted as a 16-hex string for
    ``hamming_blocked_pairs``.

    dHash is the member of the perceptual-hash family chosen because it
    is pure integer comparison — bit-exactly replicable by an oracle
    from the pixel values alone. pHash's DCT would put floats between
    the pixels and the bits (IDCT-style ulp variance), exactly what the
    from-scratch JPEG path documents as non-portable. The decode runs
    the real PNG codec executor-side (Arrow-batched); the PNG
    round-trip is load-bearing — a lossy or variant-dependent codec
    would corrupt the hash.
    """
    import pandas as pd

    out_schema = f"{id_col} long, sh string"

    def hash_batches(batches):
        import numpy as np

        from reflex_spark.functions.codecs import decode_image_bytes

        for pdf in batches:
            ids, sigs = [], []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = decode_image_bytes(bytes(payload))
                px = arr[:, :, 0].astype(np.int64)
                assert px.shape == (rows, cols), px.shape
                bits = px[:, :-1] > px[:, 1:]  # (rows, cols-1)
                fp = 0
                for b in np.flatnonzero(bits.ravel()):
                    fp |= 1 << int(b)
                ids.append(did)
                sigs.append(format(fp, "016x"))
            yield pd.DataFrame({id_col: ids, "sh": sigs})

    return images.select(id_col, payload_col).mapInPandas(hash_batches, out_schema)


def audio_features(
    audio: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame: int = 64,
    silence_abs: int = 100,
) -> DataFrame:
    """Deterministic audio DSP over DECODED WAV payloads → one row per
    clip: (id, sample_rate, n_samples, n_clipped, silence_ppm, rms,
    max_frame_rms).

    Every feature is exact integer arithmetic plus at most one IEEE
    division and one IEEE sqrt (both correctly rounded per IEEE 754, so
    bit-replicable by any engine from the same samples):

    - n_clipped: samples pinned at int16 full scale (±32767/−32768);
    - silence_ppm: samples with \\|s\\| < ``silence_abs``, scaled to parts
      per million by INTEGER floor division (no float rounding mode in
      the contract);
    - rms: sqrt(Σs² / n) — Σs² is an exact int64 (n·32768² ≪ 2⁵³);
    - max_frame_rms: max over ``frame``-sample windows of sqrt(Σs²/frame)
      (frame energy; n must divide evenly — callers pad or pick sizes).

    Runs in the Arrow stage alongside the real WAV decode
    (functions/codecs.decode_wav): the 16-bit PCM round-trip is
    lossless, so features computed from decoded bytes equal features
    from the source samples — the property an oracle checks end-to-end.
    Stereo payloads use channel 0 (deterministic, unlike a float
    downmix).
    """
    import pandas as pd

    out_schema = (
        f"{id_col} long, sample_rate int, n_samples long, n_clipped long, "
        "silence_ppm long, rms double, max_frame_rms double"
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from reflex_spark.functions.codecs import decode_wav

        for pdf in batches:
            rows = {k: [] for k in (
                id_col, "sample_rate", "n_samples", "n_clipped",
                "silence_ppm", "rms", "max_frame_rms",
            )}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                rate, dec = decode_wav(bytes(payload))
                s = dec[:, 0].astype(np.int64)
                n = len(s)
                ss = s * s
                total_ss = int(ss.sum())
                fss = ss.reshape(-1, frame).sum(axis=1)
                rows[id_col].append(did)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["n_clipped"].append(int(np.sum((s == 32767) | (s == -32768))))
                rows["silence_ppm"].append(
                    int(np.sum(np.abs(s) < silence_abs)) * 1_000_000 // n
                )
                rows["rms"].append(float(np.sqrt(total_ss / n)))
                rows["max_frame_rms"].append(float(np.max(np.sqrt(fss / float(frame)))))
            yield pd.DataFrame(rows)

    return audio.select(id_col, payload_col).mapInPandas(feats, out_schema)


def audio_silence_segments(
    audio: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    silence_abs: int = 100,
    min_run: int = 3,
) -> DataFrame:
    """Silence segmentation over DECODED WAV payloads — the
    gaps-and-islands analysis of an audio clip: classify each sample as
    silent (\\|s\\| < ``silence_abs``) or voiced, group maximal runs, and
    emit per clip (id, n_silence_runs [runs >= ``min_run``],
    max_silence_run, n_voice_segments). Pure integer run-length
    arithmetic from the decoded samples, so a SQL engine replicates it
    with the ROW_NUMBER-difference islands trick. Stereo uses channel 0
    (same rule as ``audio_features``)."""
    import pandas as pd

    out_schema = (
        f"{id_col} long, n_silence_runs long, max_silence_run long, "
        "n_voice_segments long"
    )

    def segs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from reflex_spark.functions.codecs import decode_wav

        for pdf in batches:
            out = {k: [] for k in (id_col, "n_silence_runs", "max_silence_run", "n_voice_segments")}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                _rate, dec = decode_wav(bytes(payload))
                sil = np.abs(dec[:, 0].astype(np.int64)) < silence_abs
                # maximal-run boundaries: positions where the class changes
                change = np.flatnonzero(np.diff(sil.astype(np.int8))) + 1
                starts = np.concatenate(([0], change))
                ends = np.concatenate((change, [len(sil)]))
                lens = ends - starts
                is_sil = sil[starts]
                sil_lens = lens[is_sil]
                out[id_col].append(did)
                out["n_silence_runs"].append(int(np.sum(sil_lens >= min_run)))
                out["max_silence_run"].append(int(sil_lens.max()) if len(sil_lens) else 0)
                out["n_voice_segments"].append(int(np.sum(~is_sil)))
            yield pd.DataFrame(out)

    return audio.select(id_col, payload_col).mapInPandas(segs, out_schema)


def decode_audio(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
    sample_rate: int = 16_000,
) -> DataFrame:
    """Audio feature extraction: (id, sample_rate, n_samples, duration_s, rms).

    Real codec: 16-bit PCM WAV via the stdlib wave module
    (functions/codecs.py) — sample rate comes from the RIFF header and the
    ``sample_rate`` argument is ignored. ``fake=True`` keeps the round-1
    pseudo-decode (raw bytes as headerless PCM at ``sample_rate``) for
    pipeline-shape tests with arbitrary bytes.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_samples", LongType()),
            StructField("duration_s", DoubleType()),
            StructField("rms", DoubleType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from reflex_spark.functions.codecs import decode_wav

        def features(b: bytes) -> tuple[int, int, float, float]:
            if fake:
                samples = np.frombuffer(b[: len(b) - len(b) % 2], dtype="<i2").astype(np.float64)
                rate = sample_rate
            else:
                rate, s = decode_wav(b)
                samples = s.astype(np.float64).mean(axis=1)  # downmix to mono
            n = len(samples)
            rms = float(np.sqrt(np.mean(samples**2))) if n else 0.0
            return rate, n, n / rate, round(rms, 6)

        for pdf in batches:
            feats = pdf[payload_col].map(features)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "sample_rate": feats.map(lambda t: t[0]),
                    "n_samples": feats.map(lambda t: t[1]),
                    "duration_s": feats.map(lambda t: t[2]),
                    "rms": feats.map(lambda t: t[3]),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, out_schema)


def video_frame_stats(
    videos: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Per-video integer frame statistics from DECODED MJPEG/AVI payloads
    — the video-modality analysis pass: walk the RIFF container
    (functions/codecs.decode_avi_mjpeg), JPEG-decode every frame with the
    from-scratch baseline decoder, and emit exact integer features any
    engine can replicate from the generating formula when the pixel
    round-trip is lossless:

    - n_frames, width, height (container metadata, cross-checked against
      the decoded frames);
    - pixel_total: Σ over all frames and pixels (int64 — 255·H·W·T ≪ 2⁶³);
    - max_frame_sum: max per-frame pixel sum;
    - delta_total: Σ_{t>0} Σ_px |p_t − p_{t−1}| — the inter-frame motion
      mass, the scene-cut / static-content signal a video pipeline
      samples frames by.

    Arrow-batched mapInPandas like every codec stage here; one video per
    row, frames decoded executor-side, nothing leaves the task but the
    fixed-width feature row."""
    import pandas as pd

    out_schema = (
        f"{id_col} long, n_frames int, width int, height int, "
        "pixel_total long, max_frame_sum long, delta_total long"
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from reflex_spark.functions.codecs import decode_avi_mjpeg, decode_jpeg

        for pdf in batches:
            rows = {k: [] for k in (
                id_col, "n_frames", "width", "height",
                "pixel_total", "max_frame_sum", "delta_total",
            )}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, jpegs = decode_avi_mjpeg(bytes(payload))
                arrs = []
                for fb in jpegs:
                    a = decode_jpeg(fb)
                    if a.ndim == 3:
                        a = a[:, :, 0]
                    if a.shape != (h, w):
                        raise ValueError(f"frame size {a.shape} != header {(h, w)}")
                    arrs.append(a.astype(np.int64))
                fsums = [int(a.sum()) for a in arrs]
                delta = sum(
                    int(np.abs(arrs[t] - arrs[t - 1]).sum())
                    for t in range(1, len(arrs))
                )
                rows[id_col].append(did)
                rows["n_frames"].append(len(arrs))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["pixel_total"].append(sum(fsums))
                rows["max_frame_sum"].append(max(fsums) if fsums else 0)
                rows["delta_total"].append(delta)
            yield pd.DataFrame(rows)

    return videos.select(id_col, payload_col).mapInPandas(stats, out_schema)


def video_frame_sample_stats(
    videos: DataFrame,
    every_k: int = 2,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Sample-then-decode over MJPEG/AVI — the documented policy for
    expensive decodes (SCALE_NOTES §11) made executable: the container
    walk (cheap integer parsing) yields every frame's BYTES, but only
    frames t ≡ 0 (mod ``every_k``) go through the JPEG entropy decoder —
    the cost that dominates video at scale drops by the sampling factor
    while the container metadata stays exact.

    Emits (id, n_frames_total, n_sampled, sampled_pixel_total,
    sampled_bytes): total frame count from the demux (no decode needed),
    decoded pixel mass only for the sampled frames, and the compressed
    byte size of the sampled frames (the IO the decoder actually
    touched)."""
    import pandas as pd

    out_schema = (
        f"{id_col} long, n_frames_total int, n_sampled int, "
        "sampled_pixel_total long, sampled_bytes long"
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from reflex_spark.functions.codecs import decode_avi_mjpeg, decode_jpeg

        for pdf in batches:
            rows = {k: [] for k in (
                id_col, "n_frames_total", "n_sampled",
                "sampled_pixel_total", "sampled_bytes",
            )}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                _w, _h, jpegs = decode_avi_mjpeg(bytes(payload))
                sampled = jpegs[::every_k]
                pix = 0
                for fb in sampled:
                    a = decode_jpeg(fb)
                    if a.ndim == 3:
                        a = a[:, :, 0]
                    pix += int(a.astype(np.int64).sum())
                rows[id_col].append(did)
                rows["n_frames_total"].append(len(jpegs))
                rows["n_sampled"].append(len(sampled))
                rows["sampled_pixel_total"].append(pix)
                rows["sampled_bytes"].append(sum(len(fb) for fb in sampled))
            yield pd.DataFrame(rows)

    return videos.select(id_col, payload_col).mapInPandas(stats, out_schema)


def av_container_stats(
    videos: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Joint audio+video feature extraction from MUXED two-stream AVI
    payloads (functions/codecs.decode_avi_av): one container walk
    demuxes the MJPEG frames AND the interleaved 16-bit mono PCM track,
    then both modalities reduce to exact integer features —

    - n_frames, width, height, pixel_total (video, via the from-scratch
      JPEG decoder — exact for flat-block payloads);
    - sample_rate, n_samples, sample_sum, sample_sqsum (audio — the PCM
      bytes ride the container verbatim, so these are exact always).

    The multimodal-training shape: ONE storage object per clip, one
    demux, per-modality features in the same row. Arrow-batched
    mapInPandas; nothing leaves the task but the fixed-width row."""
    import pandas as pd

    out_schema = (
        f"{id_col} long, n_frames int, width int, height int, "
        "pixel_total long, sample_rate int, n_samples long, "
        "sample_sum long, sample_sqsum long"
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from reflex_spark.functions.codecs import decode_avi_av, decode_jpeg

        for pdf in batches:
            rows = {k: [] for k in (
                id_col, "n_frames", "width", "height", "pixel_total",
                "sample_rate", "n_samples", "sample_sum", "sample_sqsum",
            )}
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, jpegs, rate, samples = decode_avi_av(bytes(payload))
                total = 0
                for fb in jpegs:
                    a = decode_jpeg(fb)
                    if a.ndim == 3:
                        a = a[:, :, 0]
                    if a.shape != (h, w):
                        raise ValueError(f"frame size {a.shape} != header {(h, w)}")
                    total += int(a.astype(np.int64).sum())
                s64 = samples.astype(np.int64)
                rows[id_col].append(did)
                rows["n_frames"].append(len(jpegs))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["pixel_total"].append(total)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(len(s64))
                rows["sample_sum"].append(int(s64.sum()))
                rows["sample_sqsum"].append(int((s64 * s64).sum()))
            yield pd.DataFrame(rows)

    return videos.select(id_col, payload_col).mapInPandas(stats, out_schema)


def audio_dft4_bins(
    audio: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Exact spectral binning over DECODED WAV payloads: a 4-point DFT
    per non-overlapping 4-sample frame, energies summed per bin across
    the clip → (id, n_frames, e_dc, e_quarter, e_nyquist,
    dominant_bin).

    N = 4 is the largest DFT whose twiddle factors are all in
    {1, 0, −1} (e^{-iπk/2}), so every bin energy is EXACT integer
    arithmetic — no floating-point FFT, no libm, nothing an oracle
    cannot replay bit-for-bit:

    - X₀ (DC)      = s₀+s₁+s₂+s₃,              e += X₀²
    - X₁ (fs/4)    = (s₀−s₂) − i(s₁−s₃),       e += (s₀−s₂)² + (s₁−s₃)²
    - X₂ (Nyquist) = s₀−s₁+s₂−s₃,              e += X₂²

    (X₃ is X₁'s conjugate — a real signal's spectrum is symmetric, so
    its energy is redundant and omitted.) dominant_bin = argmin-index
    argmax over the three totals (ties to the lower bin). Bounds: a
    frame term is ≤ (4·32768)² ≈ 1.7e10 and clips are constant-bounded,
    so int64 never overflows. Clip length must be divisible by 4
    (callers pad or pick sizes). Runs in the same Arrow stage as the
    WAV decode; vectorized numpy per batch, no shuffle beyond the scan.
    """
    import pandas as pd

    out_schema = (
        f"{id_col} long, n_frames long, e_dc long, e_quarter long, "
        "e_nyquist long, dominant_bin int"
    )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from reflex_spark.functions.codecs import decode_wav

        for pdf in batches:
            rows = {
                k: []
                for k in (
                    id_col, "n_frames", "e_dc", "e_quarter", "e_nyquist",
                    "dominant_bin",
                )
            }
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                _rate, dec = decode_wav(bytes(payload))
                s = dec[:, 0].astype(np.int64)
                # 4-point frames: truncate any ragged tail (< 4 samples)
                # rather than letting reshape raise an opaque ValueError
                # for a clip whose length isn't divisible by 4 — corpus
                # clips make no divisibility promise (ADVICE r10).
                s = s[: (len(s) // 4) * 4]
                if len(s) == 0:
                    raise ValueError(
                        f"audio_dft4_bins: doc {did!r} decodes to fewer "
                        "than 4 samples; cannot form a single DFT frame"
                    )
                fr = s.reshape(-1, 4)
                x0 = fr.sum(axis=1)
                re1 = fr[:, 0] - fr[:, 2]
                im1 = fr[:, 1] - fr[:, 3]
                x2 = fr[:, 0] - fr[:, 1] + fr[:, 2] - fr[:, 3]
                e = (
                    int((x0 * x0).sum()),
                    int((re1 * re1 + im1 * im1).sum()),
                    int((x2 * x2).sum()),
                )
                rows[id_col].append(did)
                rows["n_frames"].append(fr.shape[0])
                rows["e_dc"].append(e[0])
                rows["e_quarter"].append(e[1])
                rows["e_nyquist"].append(e[2])
                rows["dominant_bin"].append(int(max(range(3), key=lambda k: (e[k], -k))))
            yield pd.DataFrame(rows)

    return audio.select(id_col, payload_col).mapInPandas(feats, out_schema)


def audio_resample_half(
    audio: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decimate-by-2 resampling over DECODED WAV payloads with an
    integer anti-alias smoother — the audio 'resize' op of the
    multimodal family (the image path has resize/framesample; this is
    the 1-D analogue a 16 kHz -> 8 kHz corpus pass runs).

    For each even input index 2j the output sample is the [1, 2, 1]/4
    smoothed value with zero boundary padding:

        o_j = (s_{2j-1} + 2 s_{2j} + s_{2j+1} + 140000) // 4 - 35000

    The +140000 offset keeps the dividend non-negative (|sum| <=
    131068), so floor division and truncating division agree — the
    cross-engine integer-division trap (DuckDB ``//`` floors, Spark
    ``div`` truncates toward zero) never fires, and every output
    feature (count, sum, energy, max |o|) is exact int64 arithmetic an
    oracle replays from the generating formula.

    Plan: one Arrow-batched mapInPandas stage over constant-bounded
    payloads; the numpy kernel is vectorized (shifted views, no Python
    loop per sample). At 100 TB: embarrassingly parallel, no shuffle."""
    import numpy as np

    out_schema = (
        f"{id_col} long, n_in long, n_out long, sum_out long, "
        "energy_out long, max_abs_out long"
    )

    def resample(batches):
        import pandas as pd

        from reflex_spark.functions.codecs import decode_wav

        for pdf in batches:
            rows = {
                k: []
                for k in (
                    id_col, "n_in", "n_out", "sum_out", "energy_out",
                    "max_abs_out",
                )
            }
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                _rate, dec = decode_wav(bytes(payload))
                s = dec[:, 0].astype(np.int64)
                prev = np.concatenate(([np.int64(0)], s[:-1]))
                nxt = np.concatenate((s[1:], [np.int64(0)]))
                tri = (prev + 2 * s + nxt)[0::2]
                o = (tri + 140000) // 4 - 35000
                rows[id_col].append(did)
                rows["n_in"].append(len(s))
                rows["n_out"].append(len(o))
                rows["sum_out"].append(int(o.sum()))
                rows["energy_out"].append(int((o * o).sum()))
                rows["max_abs_out"].append(int(np.abs(o).max()) if len(o) else 0)
            yield pd.DataFrame(rows)

    return audio.select(id_col, payload_col).mapInPandas(resample, out_schema)
