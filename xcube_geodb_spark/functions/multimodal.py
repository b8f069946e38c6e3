"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched ``mapInPandas`` stages behind injectable ``decoder=`` /
``resizer=`` callables. Library-free formats decode FOR REAL here — PCM
WAV samples (:func:`decode_wav_features`) and uncompressed 24-bit BMP
pixels (:func:`decode_bmp_features` / :func:`resize_bmp`), stdlib+numpy
only — plus real header sniffing for png/jpeg/gif/bmp/webp
(:func:`parse_image_dims`). Codec-library formats (jpeg pixels, video)
stay behind the injection points with deterministic fakes for tests; a
deployment passes its PIL/ffmpeg callable with the same signature.

At 100 TB: binary payloads stay in their parquet row groups until the
mapInPandas stage touches them; metadata-only queries never deserialize
payload bytes (column pruning).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_binary_payload(
    df: DataFrame, source_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Treat an existing column as an opaque binary payload with typed
    metadata (content-type + byte length)."""
    return df.withColumn(payload_col, F.encode(F.col(source_col), "UTF-8")).withColumn(
        "payload_meta",
        F.struct(
            F.lit("application/octet-stream").alias("content_type"),
            F.octet_length(F.col(payload_col)).alias("n_bytes"),
        ),
    )


def deterministic_fake_decoder(payload: bytes) -> list[float]:
    """Stand-in for a real image/audio decoder: deterministic features from
    the first bytes (so tests and oracles can verify the plumbing)."""
    head = payload[:4].ljust(4, b"\0")
    return [float(b) for b in head]


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decoder: Callable[[bytes], list[float]] | None = None,
    n_features: int = 4,
) -> DataFrame:
    """Arrow-batched decode stage. ``decoder`` maps payload bytes to a
    fixed-length feature vector; defaults to the deterministic fake.
    A real deployment passes e.g. a PIL-based thumbnail featurizer here —
    the Spark plumbing is identical.
    """
    decoder = decoder or deterministic_fake_decoder
    schema = f"{id_col} long, n_bytes int, " + ", ".join(
        f"feat{i} double" for i in range(n_features)
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf[payload_col].map(lambda b: decoder(bytes(b)))
            out = pd.DataFrame({id_col: pdf[id_col]})
            out["n_bytes"] = pdf[payload_col].map(len).astype("int32")
            for i in range(n_features):
                out[f"feat{i}"] = feats.map(lambda v, i=i: float(v[i]))
            yield out

    return df.select(id_col, payload_col).mapInPandas(_decode, schema)


def deterministic_fake_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Codec stand-in for image resize: deterministic bytes derived from
    the payload head + target dims (a real deployment passes a PIL/opencv
    thumbnailer with the same ``(bytes, w, h) -> bytes`` signature)."""
    head = payload[:8]
    return b"RSZ" + width.to_bytes(2, "big") + height.to_bytes(2, "big") + head


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Arrow-batched image resize stage: one output row per input with the
    resized payload + updated metadata. The codec call is injectable
    (PIL/opencv absent from this container -> deterministic fake); the
    Spark plumbing — payload-only column pruning, mapInPandas batch
    iteration, metadata struct rebuild — is real."""
    resizer = resizer or deterministic_fake_resizer
    schema = f"{id_col} long, payload binary, width int, height int, n_bytes int"

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({id_col: pdf[id_col]})
            resized = pdf[payload_col].map(
                lambda b: resizer(bytes(b), width, height)
            )
            out["payload"] = resized
            out["width"] = width
            out["height"] = height
            out["n_bytes"] = resized.map(len).astype("int32")
            yield out

    return df.select(id_col, payload_col).mapInPandas(_resize, schema)


def deterministic_fake_frame_sampler(
    payload: bytes, frame_bytes: int = 16
) -> list[bytes]:
    """Codec stand-in for video demux: fixed-width byte windows as
    "frames" (a real deployment passes an ffmpeg-backed sampler with the
    same ``bytes -> list[bytes]`` signature)."""
    return [
        payload[i : i + frame_bytes]
        for i in range(0, max(len(payload), 1), frame_bytes)
    ]


def sample_frames(
    df: DataFrame,
    every_n: int = 1,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    sampler: Callable[[bytes], list[bytes]] | None = None,
) -> DataFrame:
    """Arrow-batched frame sampling: FAN-OUT stage emitting one row per
    kept frame (id, frame_idx, frame). The multi-row-per-input batch shape
    is the part that matters at scale — a 2-hour video becomes thousands
    of rows inside one task without driver involvement; downstream stages
    (decode_features on frames, dedup on frame hashes) are ordinary
    DataFrame ops."""
    sampler = sampler or deterministic_fake_frame_sampler
    schema = f"{id_col} long, frame_idx int, frame binary"

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                all_frames = sampler(bytes(payload))
                for i in range(0, len(all_frames), max(1, int(every_n))):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(all_frames[i])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(id_col, payload_col).mapInPandas(_sample, schema)


def parse_image_dims(b: bytes) -> tuple[str, int, int] | None:
    """REAL (not stubbed) image header sniffing: container format and pixel
    dimensions parsed straight from the leading bytes — PNG IHDR, JPEG SOFn
    marker scan, GIF logical screen, BMP DIB, WebP VP8/VP8L/VP8X. No codec
    library involved, so this runs in any environment; full pixel decode
    stays behind the injectable ``decoder=``.

    Returns ``(format, width, height)`` or ``None`` when the payload is not
    a recognized image."""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if b[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return (
                    "jpeg",
                    int.from_bytes(b[i + 7 : i + 9], "big"),
                    int.from_bytes(b[i + 5 : i + 7], "big"),
                )
            i += 2 + seglen
        return None
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if b[:2] == b"BM" and len(b) >= 26:
        # dispatch on the DIB header size at offset 14: 12 =
        # BITMAPCOREHEADER (OS/2, 16-bit dims), >= 40 = BITMAPINFOHEADER
        # family (32-bit dims, height may be negative for top-down rows)
        dib = int.from_bytes(b[14:18], "little")
        if dib == 12:
            return (
                "bmp",
                int.from_bytes(b[18:20], "little"),
                int.from_bytes(b[20:22], "little"),
            )
        if dib >= 40:
            return (
                "bmp",
                int.from_bytes(b[18:22], "little", signed=True),
                abs(int.from_bytes(b[22:26], "little", signed=True)),
            )
        return None
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP" and len(b) >= 30:
        chunk = b[12:16]
        if chunk == b"VP8X":
            return (
                "webp",
                int.from_bytes(b[24:27], "little") + 1,
                int.from_bytes(b[27:30], "little") + 1,
            )
        if chunk == b"VP8L":
            bits = int.from_bytes(b[21:25], "little")
            return ("webp", (bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1)
        if chunk == b"VP8 ":
            return (
                "webp",
                int.from_bytes(b[26:28], "little") & 0x3FFF,
                int.from_bytes(b[28:30], "little") & 0x3FFF,
            )
    return None


def with_image_dims(
    df: DataFrame, payload_col: str = "payload", meta_col: str = "image_meta"
) -> DataFrame:
    """Attach ``(format, width, height)`` parsed from image payload headers
    as a struct column — an Arrow-batched pandas UDF over the payload
    bytes, composable with any frame (all other columns pass through).
    Unrecognized payloads yield a NULL struct. Header sniffing reads only
    the payload column; metadata-only consumers downstream still prune it.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("format string, width int, height int")
    def _dims(s: pd.Series) -> pd.DataFrame:
        parsed = s.map(
            lambda b: parse_image_dims(bytes(b)) if b is not None else None
        )
        return pd.DataFrame(
            {
                "format": parsed.map(lambda t: t[0] if t else None),
                "width": parsed.map(lambda t: t[1] if t else None),
                "height": parsed.map(lambda t: t[2] if t else None),
            }
        )

    return df.withColumn(meta_col, _dims(F.col(payload_col)))


# ---------------------------------------------------------------------------
# REAL codecs for library-free formats: PCM WAV + uncompressed 24-bit BMP.
# These are full decodes (samples / pixels), not header sniffs — stdlib +
# numpy only, so they run in any environment and plug straight into the
# ``decoder=`` / ``resizer=`` injection points the stubbed paths document.
# ---------------------------------------------------------------------------


def decode_wav_features(payload: bytes) -> list[float]:
    """REAL audio decode for PCM WAV: ``[duration_s, sample_rate,
    n_channels, rms, peak]`` computed from the actual samples (stdlib
    ``wave`` container parse + numpy over the PCM frames; 8/16/32-bit
    integer PCM). The shape matches ``decode_features(n_features=5)``.
    Raises on non-WAV payloads — callers route by sniffed content type."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(bytes(payload))) as w:
        sr = w.getframerate()
        nch = w.getnchannels()
        n = w.getnframes()
        sw = w.getsampwidth()
        raw = w.readframes(n)
    if sw == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
        full = 127.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
        full = 32767.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64)
        full = 2147483647.0
    else:
        raise ValueError(f"unsupported WAV sample width: {sw}")
    if len(x) == 0:
        return [0.0, float(sr), float(nch), 0.0, 0.0]
    x = x / full
    rms = float(np.sqrt(np.mean(x * x)))
    peak = float(np.max(np.abs(x)))
    return [n / sr, float(sr), float(nch), rms, peak]


def _bmp24_pixels(payload: bytes):
    """Pixel array (h, w, 3 RGB) from an uncompressed 24-bit
    BITMAPINFOHEADER BMP; handles bottom-up and top-down row order and
    4-byte row padding."""
    import numpy as np

    b = bytes(payload)
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(b[10:14], "little")
    dib = int.from_bytes(b[14:18], "little")
    if dib < 40:
        raise ValueError("BITMAPCOREHEADER BMP not supported by the decoder")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP (got {bpp}bpp/c{comp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        b, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp24(pixels) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed bottom-up 24-bit BMP bytes."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = px[::-1, :, ::-1].reshape(h, w * 3)  # RGB -> BGR
    data = body.tobytes()
    off = 14 + 40
    header = (
        b"BM"
        + (off + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


def decode_bmp_features(payload: bytes) -> list[float]:
    """REAL image decode for 24-bit BMP: ``[width, height, mean_r,
    mean_g, mean_b]`` from the actual pixel array."""
    px = _bmp24_pixels(payload)
    h, w, _ = px.shape
    means = px.reshape(-1, 3).mean(axis=0)
    return [float(w), float(h), float(means[0]), float(means[1]),
            float(means[2])]


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """REAL image resize for 24-bit BMP: nearest-neighbor resample of the
    actual pixels, re-encoded as a valid BMP — the ``(bytes, w, h) ->
    bytes`` signature :func:`resize_images` injects."""
    import numpy as np

    px = _bmp24_pixels(payload)
    h, w, _ = px.shape
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_bmp24(px[yi][:, xi])
