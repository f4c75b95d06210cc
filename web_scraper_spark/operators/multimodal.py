"""Multimodal (binary-payload) column plumbing.

Images/audio/video ride as opaque ``binary`` columns with typed
metadata (exactly how ``pages.html`` rides here). The Spark-side
contract — schema, Arrow batching, partitioning, UDF signatures — is
real and tested. Decode capability is split honestly:

- ``binary_meta``: native-expression metadata (byte length, md5,
  magic-byte sniff) — no Python.
- ``decode_image_headers``: REAL decode of PNG/GIF/JPEG container
  headers (dimensions, bit depth, channels) by byte layout — works
  without any media library, no stand-in. This covers the metadata
  tier a corpus pipeline needs to size/route/filter image payloads.
- ``decode_features`` / ``frame_sample``: the default path is the
  deterministic byte-arithmetic stand-in (cheap, fully oracle-checked);
  ``strict=True`` routes through the REAL codec-free decoders below —
  only unknown bytes raise.

Every image and audio format here is now a REAL end-to-end decode
(oracle-checked bit-for-bit), shrinking the stub surface to video
codecs alone:

- audio: ``operators/audio.py`` — full WAV/RIFF PCM decode
  (8/16/24/32-bit int + IEEE float), sample features, frame windows
  (battery ``audio_wav_decode`` / ``audio_frame_windows``);
- image pixels: ``operators/rawmedia.py:decode_bmp_features`` — BI_RGB
  BMP pixel recovery with exact channel stats (``bmp_pixel_decode``) —
  ``decode_png_features``: full PNG decode via stdlib zlib + the
  five spec §9 scanline filters (``png_pixel_decode``) — and
  ``operators/jpeg.py``: full BASELINE JPEG decode (canonical Huffman,
  byte unstuffing, restarts, dequantize, exact matrix IDCT, JFIF
  color; ``jpeg_pixel_decode``);
- animation: ``operators/rawmedia.py:gif_frame_index`` — GIF
  frame-structure walk with per-frame geometry + delays
  (``gif_frame_index``) — and ``decode_gif_features``: full GIF pixel
  decode (pure-Python LZW + palette + deinterlace,
  ``gif_pixel_decode``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "sniff_format",
    "binary_meta",
    "parse_image_header",
    "decode_image_headers",
    "decode_features",
    "frame_sample",
]

_MAGIC = [
    ("png", b"\x89PNG"),
    ("jpeg", b"\xff\xd8\xff"),
    ("gif", b"GIF8"),
    ("riff", b"RIFF"),  # wav/webp container
    ("pdf", b"%PDF"),
    ("html", b"<htm"),
]


def sniff_format(data: Column) -> Column:
    """Container sniff from magic bytes — pure Column expr."""
    expr = F.lit("unknown")
    for name, magic in reversed(_MAGIC):
        expr = F.when(
            F.substring(data, 1, len(magic)) == F.lit(magic), F.lit(name)
        ).otherwise(expr)
    return expr


def sniff_media_format(data: Column) -> Column:
    """Full media-container sniff — pure Column expr over the decoders
    this package really has: png/gif/bmp/jpeg/wav/mp4/mp3/webm/ogg.
    Distinguishes RIFF subtypes by bytes 9-12 and spots ISO BMFF by the
    ``ftyp`` box type at offset 5. (``sniff_format`` above is the older
    coarse sniff kept for the pinned ``multimodal_meta`` battery.)"""

    def pre(n: int) -> Column:
        return F.substring(data, 1, n)

    return (
        F.when(pre(4) == F.lit(b"\x89PNG"), F.lit("png"))
        .when(pre(3) == F.lit(b"\xff\xd8\xff"), F.lit("jpeg"))
        .when(pre(4) == F.lit(b"GIF8"), F.lit("gif"))
        .when(pre(4) == F.lit(b"\x1a\x45\xdf\xa3"), F.lit("webm"))
        .when(
            (pre(4) == F.lit(b"RIFF"))
            & (F.substring(data, 9, 4) == F.lit(b"WAVE")),
            F.lit("wav"),
        )
        .when(
            (pre(4) == F.lit(b"RIFF"))
            & (F.substring(data, 9, 4) == F.lit(b"WEBP")),
            F.lit("webp"),
        )
        .when(F.substring(data, 5, 4) == F.lit(b"ftyp"), F.lit("mp4"))
        .when(pre(4) == F.lit(b"OggS"), F.lit("ogg"))
        .when(pre(4) == F.lit(b"fLaC"), F.lit("flac"))
        .when(pre(5) == F.lit(b"%PDF-"), F.lit("pdf"))
        .when(pre(4) == F.lit(b"PK\x03\x04"), F.lit("zip"))
        # ustar magic sits at byte offset 257, not 0
        .when(F.substring(data, 258, 5) == F.lit(b"ustar"), F.lit("tar"))
        .when(pre(3) == F.lit(b"ID3"), F.lit("mp3"))
        .when(pre(2) == F.lit(b"\xff\xfb"), F.lit("mp3"))
        .when(pre(2) == F.lit(b"BM"), F.lit("bmp"))
        # bare H.264 Annex-B elementary stream: 3/4-byte start code at
        # byte 0 (no container writes a leading 0x000001)
        .when(pre(4) == F.lit(b"\x00\x00\x00\x01"), F.lit("h264"))
        .when(pre(3) == F.lit(b"\x00\x00\x01"), F.lit("h264"))
        # MPEG-TS: 0x47 sync repeating on the 188-byte grid (a lone
        # 0x47 first byte is not enough — demand the second sync)
        .when(
            (pre(1) == F.lit(b"\x47"))
            & (F.substring(data, 189, 1) == F.lit(b"\x47")),
            F.lit("mpegts"),
        )
        # ADTS AAC: 12-bit sync + layer 00 -> second byte in
        # {F0,F1,F8,F9} (0xFFFA/0xFFFB are MPEG-audio, matched above)
        .when(
            (pre(1) == F.lit(b"\xff"))
            & (
                (F.substring(data, 2, 1) == F.lit(b"\xf0"))
                | (F.substring(data, 2, 1) == F.lit(b"\xf1"))
                | (F.substring(data, 2, 1) == F.lit(b"\xf8"))
                | (F.substring(data, 2, 1) == F.lit(b"\xf9"))
            ),
            F.lit("aac"),
        )
        # AV1 low-overhead stream: temporal-delimiter OBU (type 2,
        # has_size, size 0) is the mandated first OBU of a temporal unit
        .when(pre(2) == F.lit(b"\x12\x00"), F.lit("av1"))
        .otherwise(F.lit("unknown"))
    )


def binary_meta(df: DataFrame, data_col: str = "data") -> DataFrame:
    """Adds (n_bytes, content_md5, format) typed metadata columns."""
    return (
        df.withColumn("n_bytes", F.octet_length(F.col(data_col)).cast("long"))
        .withColumn("content_md5", F.md5(F.col(data_col)))
        .withColumn("format", sniff_format(F.col(data_col)))
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type → sample channels (ISO 15948 table 11.1)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# JPEG SOFn markers that carry frame dimensions (C4/C8/CC are
# huffman/arithmetic/hierarchical tables, not frames)
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}


def parse_image_header(
    data: bytes,
) -> tuple[str, int, int, int, int] | None:
    """REAL image-header decode — no media libraries, no stand-in:
    ``(format, width, height, bit_depth, channels)`` parsed from the
    published container layouts, or ``None`` when the payload is not a
    recognized/well-formed image.

    - PNG (ISO 15948): 8-byte signature, then the IHDR chunk — width/
      height big-endian u32 at offsets 16/20, bit depth at 24, color
      type at 25 (mapped to sample channels).
    - GIF (87a/89a): logical screen descriptor — width/height
      little-endian u16 at offsets 6/8; color-resolution bits of the
      packed byte at 10 give the palette bit depth; palette entries are
      RGB, so channels = 3.
    - JPEG (ITU T.81): marker scan from SOI to the first SOFn frame
      header — precision, height, width, component count.
    """
    n = len(data)
    if n >= 26 and data[:8] == _PNG_SIG and data[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(data[16:20], "big"),
            int.from_bytes(data[20:24], "big"),
            data[24],
            _PNG_CHANNELS.get(data[25], 0),
        )
    if n >= 11 and data[:6] in (b"GIF87a", b"GIF89a"):
        return (
            "gif",
            int.from_bytes(data[6:8], "little"),
            int.from_bytes(data[8:10], "little"),
            ((data[10] >> 4) & 0x7) + 1,
            3,
        )
    if n >= 4 and data[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= n:
            if data[pos] != 0xFF:
                return None  # lost marker sync
            marker = data[pos + 1]
            if marker == 0xFF:
                pos += 1  # fill byte
                continue
            if marker in _JPEG_SOF:
                if pos + 10 > n:
                    return None
                return (
                    "jpeg",
                    int.from_bytes(data[pos + 7 : pos + 9], "big"),
                    int.from_bytes(data[pos + 5 : pos + 7], "big"),
                    data[pos + 4],
                    data[pos + 9],
                )
            if marker == 0x01 or 0xD0 <= marker <= 0xD8:
                pos += 2  # standalone marker
            else:
                pos += 2 + int.from_bytes(data[pos + 2 : pos + 4], "big")
    return None


_HEADER_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("bit_depth", IntegerType(), True),
        StructField("channels", IntegerType(), True),
    ]
)


def decode_image_headers(
    df: DataFrame, data_col: str = "data", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched REAL header decode over binary payloads: one
    ``mapInPandas`` stage running ``parse_image_header`` per payload.
    Unlike ``decode_features``/``frame_sample`` (whose pixel-level work
    is stubbed for lack of media libs), this stage is not a stand-in —
    dimensions, bit depth, and channel counts come from the actual
    container bytes, so the pipeline can size/route/filter multimodal
    corpora (drop icons, bucket by aspect ratio, cap decode cost) at
    100 TB without any Python imaging dependency. Unrecognized or
    malformed payloads yield NULL fields, never an error."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "format", "width", "height",
                                   "bit_depth", "channels")}
            for i, raw in zip(pdf[id_col], pdf[data_col]):
                parsed = (
                    parse_image_header(bytes(raw)) if raw is not None else None
                )
                out["doc_id"].append(int(i))
                if parsed is None:
                    for k in ("format", "width", "height", "bit_depth",
                              "channels"):
                        out[k].append(None)
                else:
                    fmt, w, h, depth, ch = parsed
                    out["format"].append(fmt)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["bit_depth"].append(depth)
                    out["channels"].append(ch)
            yield pd.DataFrame(out)

    src = df.select(F.col(id_col), F.col(data_col))
    return src.mapInPandas(run, schema=_HEADER_SCHEMA)


_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("format", StringType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
        StructField("n_frames", IntegerType(), True),
    ]
)


def decode_features(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "doc_id",
    feature_dim: int = 8,
    strict: bool = False,
    decoder: str = "pure",
) -> DataFrame:
    """Decode/feature-extract stage over binary payloads.

    With ``strict=True`` every payload is REALLY decoded by the
    codec-free decoders in this package — PNG/BMP/GIF/JPEG pixels
    (``operators/rawmedia.py`` / ``operators/jpeg.py``) and WAV PCM
    samples (``operators/audio.py``) — and the feature vector is real
    content statistics: images emit ``[w, h, ch, mean, std, min, max,
    aspect]`` (pixel stats /255), WAV emits ``[channels, rate/1e5,
    bits/64, n_frames scaled, mean, std, min, max]`` over samples
    normalized to the bit depth; ``n_frames`` is the true GIF frame
    count (1 for static images, PCM frame count for WAV). MP4/WebM/MP3
    payloads emit real CONTAINER-level features (frame/keyframe
    counts, duration, mean coded-frame length, dimensions — no
    pixel-decode claim). Only a payload that genuinely needs a codec
    this container lacks (unknown bytes, raw video elementary streams)
    raises ``NotImplementedError`` — strict mode never emits a
    stand-in value.

    By default (``strict=False``) it emits the deterministic
    byte-arithmetic stand-in (``feature[i]`` = mean of payload bytes at
    positions ≡ i (mod dim) scaled to [0,1]; ``n_frames`` = n_bytes //
    1024 + 1) — the cheap path when payload-level stats are enough.
    The Arrow batch shape, schema, and partitioning are identical.

    ``decoder`` selects the image pixel-decode implementation for the
    strict path: ``"pure"`` (default) uses this package's codec-free
    decoders; ``"native"`` routes PNG/GIF/BMP/JPEG through PIL/libjpeg
    (operators/native_codecs.py) — same array conventions, ~100-1000x
    the throughput at real image sizes. Availability is checked HERE,
    at plan-build time on the driver (ImportError, not a mid-stage
    surprise). WAV/MP4/WebM/MP3 branches are identical in both modes.
    """
    if decoder not in ("pure", "native"):
        raise ValueError(f"decoder must be 'pure' or 'native', got {decoder!r}")
    if decoder == "native":
        from .native_codecs import require_native

        require_native()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if strict:
            pixel_decode = None
            if decoder == "native":
                from .native_codecs import native_pixel_decode as pixel_decode
            yield from _run_strict_features(
                batches, id_col, data_col, feature_dim, pixel_decode
            )
            return
        for pdf in batches:
            ids, sizes, fmts, feats, frames = [], [], [], [], []
            for i, raw in zip(pdf[id_col], pdf[data_col]):
                b = np.frombuffer(bytes(raw), dtype=np.uint8)
                ids.append(int(i))
                sizes.append(int(b.size))
                fmt = "unknown"
                for name, magic in _MAGIC:
                    if bytes(raw)[: len(magic)] == magic:
                        fmt = name
                        break
                fmts.append(fmt)
                if b.size == 0:
                    feats.append([0.0] * feature_dim)
                else:
                    feats.append(
                        [
                            round(float(b[k::feature_dim].mean()) / 255.0, 6)
                            if b[k::feature_dim].size
                            else 0.0
                            for k in range(feature_dim)
                        ]
                    )
                frames.append(int(b.size // 1024 + 1))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": sizes,
                    "format": fmts,
                    "feature": feats,
                    "n_frames": frames,
                }
            )

    src = df.select(F.col(id_col), F.col(data_col))
    return src.mapInPandas(run, schema=_FEATURE_SCHEMA)


def _strict_decode_one(raw: bytes, feature_dim: int, pixel_decode=None):
    """-> (format, feature, n_frames) via the REAL codec-free decoders,
    or None when the payload genuinely needs an unavailable codec.
    ``pixel_decode`` (the native seam) replaces only the image pixel
    stage; format routing and container walks stay identical."""
    import numpy as np

    from .audio import decode_wav_samples
    from .jpeg import decode_jpeg_pixels
    from .rawmedia import decode_bmp_pixels, decode_png_pixels, gif_decode_pixels, gif_frames

    def pad(vec):
        vec = [round(float(v), 6) for v in vec][:feature_dim]
        return vec + [0.0] * (feature_dim - len(vec))

    head = raw[:12]
    if head.startswith(b"\x89PNG"):
        px = pixel_decode(raw) if pixel_decode else decode_png_pixels(raw)
        fmt, frames = "png", 1
    elif head.startswith((b"GIF87a", b"GIF89a")):
        px = pixel_decode(raw) if pixel_decode else gif_decode_pixels(raw)
        fmt = "gif"
        fr = gif_frames(raw)
        frames = len(fr) if fr else 1
    elif head.startswith(b"BM"):
        px = pixel_decode(raw) if pixel_decode else decode_bmp_pixels(raw)
        fmt, frames = "bmp", 1
    elif head.startswith(b"\xff\xd8"):
        px = pixel_decode(raw) if pixel_decode else decode_jpeg_pixels(raw)
        fmt, frames = "jpeg", 1
    elif head.startswith(b"RIFF") and head[8:12] == b"WAVE":
        dec = decode_wav_samples(raw)
        if dec is None:
            return None
        (_afmt, channels, rate, bits, n_frames, _off, _size), samples = dec
        s = np.asarray(samples, np.float64) / float(1 << max(bits - 1, 1))
        stats = (
            [s.mean(), s.std(), s.min(), s.max()] if s.size else [0.0] * 4
        )
        return (
            "wav",
            pad([channels, rate / 1e5, bits / 64.0, min(n_frames, 10**6) / 1e6] + stats),
            int(n_frames),
        )
    elif len(raw) >= 12 and raw[4:8] == b"ftyp":
        from .video import mp4_sample_offsets, parse_mp4

        tracks = parse_mp4(raw)
        vid = next((t for t in tracks or () if t["handler"] == "vide"), None)
        if vid is None:
            return None
        offs = mp4_sample_offsets(vid) or []
        dur = (
            vid["duration"] / vid["timescale"]
            if vid["timescale"] and vid["duration"] is not None
            else 0.0
        )
        mean_len = float(np.mean([ln for _o, ln in offs])) if offs else 0.0
        return (
            "mp4",
            pad(
                [
                    len(offs),
                    len(vid["sync"]),
                    dur,
                    mean_len,
                    vid["width"] or 0,
                    vid["height"] or 0,
                ]
            ),
            len(offs),
        )
    elif head.startswith(b"\x1a\x45\xdf\xa3"):
        from .video import parse_webm

        parsed = parse_webm(raw)
        if parsed is None:
            return None
        fr = parsed["frames"]
        vid = next((t for t in parsed["tracks"] if t[1] == 1), None)
        mean_len = float(np.mean([f[3] for f in fr])) if fr else 0.0
        kf = sum(f[4] for f in fr)
        return (
            "webm",
            pad(
                [
                    len(fr),
                    kf,
                    (max((f[1] for f in fr), default=0)) / 1000.0,
                    mean_len,
                    (vid[3] or 0) if vid else 0,
                    (vid[4] or 0) if vid else 0,
                ]
            ),
            len(fr),
        )
    elif head.startswith(b"ID3") or (
        len(raw) >= 2 and raw[0] == 0xFF and (raw[1] & 0xFE) == 0xFA
    ):
        from .audio import mp3_frames

        fr = mp3_frames(raw)
        if fr is None:
            return None
        dur = sum(1152.0 / sr for _i, _o, _l, _br, sr in fr)
        return (
            "mp3",
            pad(
                [
                    len(fr),
                    dur,
                    float(np.mean([br for *_x, br, _sr in fr])),
                    float(np.mean([ln for _i, _o, ln, _br, _sr in fr])),
                ]
            ),
            len(fr),
        )
    else:
        return None
    if px is None:
        return None
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ch = px.shape
    s = px.astype(np.float64) / 255.0
    return (
        fmt,
        pad([w, h, ch, s.mean(), s.std(), s.min(), s.max(), w / h]),
        frames,
    )


def _run_strict_features(
    batches: Iterator[pd.DataFrame],
    id_col: str,
    data_col: str,
    feature_dim: int,
    pixel_decode=None,
) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for i, raw in zip(pdf[id_col], pdf[data_col]):
            b = b"" if raw is None else bytes(raw)
            dec = _strict_decode_one(b, feature_dim, pixel_decode)
            if dec is None:
                raise NotImplementedError(
                    f"doc {int(i)}: payload needs a codec this container "
                    "lacks (video or unrecognized format); only PNG/BMP/"
                    "GIF/JPEG/WAV decode codec-free"
                )
            fmt, feat, frames = dec
            rows.append(
                {
                    "doc_id": int(i),
                    "n_bytes": len(b),
                    "format": fmt,
                    "feature": feat,
                    "n_frames": frames,
                }
            )
        yield pd.DataFrame.from_records(
            rows, columns=[f.name for f in _FEATURE_SCHEMA.fields]
        )


_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("frame_idx", IntegerType(), False),
        StructField("offset", LongType(), False),
        StructField("frame_len", IntegerType(), False),
        StructField("byte_mean", DoubleType(), False),
    ]
)


def frame_sample(
    df: DataFrame,
    data_col: str = "data",
    id_col: str = "doc_id",
    frame_size: int = 1024,
    max_frames: int = 4,
    strict: bool = False,
) -> DataFrame:
    """Frame-sampling stage over binary payloads.

    With ``strict=True`` frames are REAL: GIF payloads are walked for
    their true frame extents (``gif_frames(with_offsets=True)``) and
    ``min(max_frames, n_frames)`` frames are evenly sampled, each one
    genuinely LZW-decoded — ``offset``/``frame_len`` are the frame's
    byte extent in the container and ``byte_mean`` is the decoded
    frame's pixel mean /255. Single-frame images (PNG/BMP/JPEG) yield
    their one real frame. MP4 and WebM payloads yield their true
    per-frame CODED-byte extents (sample tables / SimpleBlocks, no
    pixel-decode claim: ``byte_mean`` is the mean of the frame's coded
    bytes when present in the payload, else 0 for index-only
    moov/DASH-init files); MP3 likewise per MPEG frame. Unknown bytes
    raise ``NotImplementedError`` (WAV windows belong to
    ``operators/audio.py:audio_frame_windows``).

    By default (``strict=False``) the deterministic stand-in treats the
    payload as fixed-size byte windows ("frames") and samples
    ``min(max_frames, n_frames)`` of them evenly across the payload:
    sampled global frame index ``(i * n_frames) // n_sel``. One output
    row per sampled frame — the fan-out (explode) shape a real frame
    sampler produces, so downstream per-frame operators (dedup,
    feature-extract) are exercised against the true cardinality. Empty
    payloads produce no frames.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        if strict:
            yield from _run_strict_frames(batches, id_col, data_col, max_frames)
            return
        for pdf in batches:
            ids, fidx, offs, lens, means = [], [], [], [], []
            for i, raw in zip(pdf[id_col], pdf[data_col]):
                b = np.frombuffer(bytes(raw), dtype=np.uint8)
                n = int(b.size)
                if n == 0:
                    continue
                n_frames = -(-n // frame_size)
                n_sel = min(max_frames, n_frames)
                for s in range(n_sel):
                    f = (s * n_frames) // n_sel
                    off = f * frame_size
                    chunk = b[off : off + frame_size]
                    ids.append(int(i))
                    fidx.append(f)
                    offs.append(off)
                    lens.append(int(chunk.size))
                    means.append(round(float(chunk.mean()) / 255.0, 6))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": fidx,
                    "offset": offs,
                    "frame_len": lens,
                    "byte_mean": means,
                }
            )

    src = df.select(F.col(id_col), F.col(data_col))
    return src.mapInPandas(run, schema=_FRAME_SCHEMA)


def with_synth_mixed_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture stage for the routed pipeline: payload format by
    ``doc_id % 8`` (png, gif, bmp, jpeg, wav, mp4, mp3, webm), each
    with the SAME geometry formulas as its dedicated battery so the
    per-format oracles compose."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BinaryType as _Bin

    from .audio import synth_mp3, synth_wav_pcm16
    from .jpeg import synth_jpeg
    from .rawmedia import synth_bmp, synth_gif_pixels, synth_png
    from .video import synth_mp4, synth_webm

    def one(i: int) -> bytes:
        m = i % 8
        if m == 0:
            return synth_png(i, 9 + i % 14, 5 + i % 11, 1 + i % 4)
        if m == 1:
            return synth_gif_pixels(i, 9 + i % 14, 5 + i % 11)
        if m == 2:
            return synth_bmp(i, 16 + i % 17, 8 + i % 13, 24 + 8 * (i % 2))
        if m == 3:
            return synth_jpeg(i, 1 + i % 4, 1 + i % 3)
        if m == 4:
            return synth_wav_pcm16(i, 400 + i % 600, 8000 * (1 + i % 2), 1 + i % 2)
        if m == 5:
            return synth_mp4(i, 5 + i % 9)
        if m == 6:
            return synth_mp3(i, 3 + i % 6)
        return synth_webm(i, 5 + i % 9)

    @pandas_udf(_Bin())
    def _synth(ids: pd.Series) -> pd.Series:
        return pd.Series([one(int(i)) for i in ids])

    return df.withColumn("data", _synth(F.col(id_col)))


def _container_frame_extents(b: bytes):
    """-> [(offset, length)] of REAL per-frame coded-byte extents for
    MP4 (video track sample tables), WebM (SimpleBlocks), or MP3
    (MPEG frames); None when ``b`` is none of those."""
    head = b[:12]
    if len(b) >= 12 and b[4:8] == b"ftyp":
        from .video import mp4_sample_offsets, parse_mp4

        tracks = parse_mp4(b)
        vid = next((t for t in tracks or () if t["handler"] == "vide"), None)
        if vid is None:
            return None
        return mp4_sample_offsets(vid)
    if head.startswith(b"\x1a\x45\xdf\xa3"):
        from .video import parse_webm

        parsed = parse_webm(b)
        if parsed is None or not parsed["frames"]:
            return None
        return [(off, ln) for _t, _ts, off, ln, _k in parsed["frames"]]
    if head.startswith(b"ID3") or (
        len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xFE) == 0xFA
    ):
        from .audio import mp3_frames

        fr = mp3_frames(b)
        if fr is None:
            return None
        return [(off, ln) for _i, off, ln, _br, _sr in fr]
    return None


def _run_strict_frames(
    batches: Iterator[pd.DataFrame], id_col: str, data_col: str, max_frames: int
) -> Iterator[pd.DataFrame]:
    import numpy as np

    from .jpeg import decode_jpeg_pixels
    from .rawmedia import (
        decode_bmp_pixels,
        decode_png_pixels,
        gif_decode_pixels,
        gif_frames,
    )

    def mean01(px) -> float:
        return round(float(np.asarray(px, np.float64).mean()) / 255.0, 6)

    for pdf in batches:
        rows = []
        for i, raw in zip(pdf[id_col], pdf[data_col]):
            b = b"" if raw is None else bytes(raw)
            head = b[:12]
            if head.startswith((b"GIF87a", b"GIF89a")):
                fr = gif_frames(b, with_offsets=True)
                if not fr:
                    raise NotImplementedError(
                        f"doc {int(i)}: undecodable GIF frame structure"
                    )
                n_frames = len(fr)
                n_sel = min(max_frames, n_frames)
                for s in range(n_sel):
                    f = (s * n_frames) // n_sel
                    px = gif_decode_pixels(b, frame=f)
                    if px is None:
                        raise NotImplementedError(
                            f"doc {int(i)}: GIF frame {f} needs pixel "
                            "decode this payload does not permit"
                        )
                    _idx, _x, _y, _w, _h, _d, off, blen = fr[f]
                    rows.append((int(i), f, off, int(blen), mean01(px)))
                continue
            extents = _container_frame_extents(b)
            if extents is not None:
                n_frames = len(extents)
                n_sel = min(max_frames, n_frames)
                for s in range(n_sel):
                    f = (s * n_frames) // n_sel
                    off, ln = extents[f]
                    chunk = b[off : off + ln]
                    bm = (
                        round(float(np.frombuffer(chunk, np.uint8).mean()) / 255.0, 6)
                        if len(chunk) == ln and ln
                        else 0.0
                    )
                    rows.append((int(i), f, off, ln, bm))
                continue
            px = None
            if head.startswith(b"\x89PNG"):
                px = decode_png_pixels(b)
            elif head.startswith(b"BM"):
                px = decode_bmp_pixels(b)
            elif head.startswith(b"\xff\xd8"):
                px = decode_jpeg_pixels(b)
            if px is None:
                raise NotImplementedError(
                    f"doc {int(i)}: frame sampling needs a codec this "
                    "container lacks (unknown format; WAV windows -> "
                    "audio_frame_windows)"
                )
            rows.append((int(i), 0, 0, len(b), mean01(px)))
        yield pd.DataFrame.from_records(
            rows, columns=[f.name for f in _FRAME_SCHEMA.fields]
        )
