"""Multimodal (image/audio/video) column plumbing.

Opaque ``binary`` payload columns + typed metadata structs, processed with
Arrow-batched ``mapInPandas`` — the Spark-side plumbing (schema, batch
shape, partition sizing) is real and tested.  Decoding: PIL/soundfile are
used when installed; PNG images additionally decode through a vendored
pure-python decoder (``png_decode_gray`` — stdlib zlib/struct), so the
real-codec path is live even in codec-less containers.  Anything else
falls back to deterministic stub features at the clearly-marked
``real_decode`` boundary.

At scale: payloads dominate row size, so operators here repartition by
byte-budget (``target_rows_per_batch``) before the UDF, and feature
extraction projects the payload away as early as possible.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


# Optional-dependency codec detection: the real decode path activates
# automatically when the libraries exist; in codec-less containers every
# operator falls back to the deterministic stub and the same tests pass.
try:  # pragma: no cover - depends on container
    from PIL import Image as _PILImage  # type: ignore

    HAS_PIL = True
except ImportError:
    _PILImage = None
    HAS_PIL = False

try:  # pragma: no cover - depends on container
    import soundfile as _soundfile  # type: ignore

    HAS_SOUNDFILE = True
except ImportError:
    _soundfile = None
    HAS_SOUNDFILE = False


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def png_decode_gray(payload: bytes) -> np.ndarray:
    """Minimal pure-python PNG decoder (stdlib zlib/struct only) so the
    real-codec path works in codec-less containers: 8-bit depth,
    non-interlaced, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
    6 (RGBA); all five scanline filters.  Color converts to luma with
    PIL's ``convert("L")`` arithmetic (ITU-R 601-2, truncating), so the
    output is byte-identical to the PIL path on supported files.
    Raises ValueError on anything else — never a silent wrong answer."""
    import struct
    import zlib

    if not payload.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = len(_PNG_MAGIC), None, b""
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color)
    if depth != 8 or channels is None or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={depth} color={color} "
            f"interlace={interlace}) — only 8-bit non-interlaced gray/RGB/±alpha"
        )
    raw = zlib.decompress(idat)
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row = np.frombuffer(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)], dtype=np.uint8
        ).astype(np.int32)
        f = raw[y * (stride + 1)]
        if f == 0:  # None
            cur = row
        elif f == 2:  # Up
            cur = (row + prev) & 0xFF
        else:  # Sub / Average / Paeth carry left-neighbor state
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - channels] if x >= channels else 0
                b = prev[x]
                c = prev[x - channels] if x >= channels else 0
                if f == 1:  # Sub
                    pred = a
                elif f == 3:  # Average
                    pred = (a + b) >> 1
                elif f == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad PNG filter byte {f}")
                cur[x] = (row[x] + pred) & 0xFF
        out[y] = cur
        prev = cur.astype(np.int32)
    px = out.reshape(h, w, channels)
    if color == 0:
        return px[:, :, 0].copy()
    if color == 4:  # gray+alpha: luma is the gray channel
        return px[:, :, 0].copy()
    # RGB(A) → L exactly like PIL convert("L"): (R*299+G*587+B*114)/1000
    rgb = px[:, :, :3].astype(np.uint32)
    return (
        (rgb[:, :, 0] * 299 + rgb[:, :, 1] * 587 + rgb[:, :, 2] * 114) // 1000
    ).astype(np.uint8)


def png_encode_gray(arr: np.ndarray) -> bytes:
    """Companion encoder (8-bit grayscale, filter 0, one IDAT) so tests and
    fixtures can synthesize valid PNGs without any codec library."""
    import struct
    import zlib

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("png_encode_gray wants a 2-D uint8 array")
    h, w = a.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


_WAV_MAGIC = b"RIFF"


def wav_decode_pcm(payload: bytes) -> np.ndarray:
    """PCM WAV decoder on the stdlib ``wave`` module — no soundfile
    needed, so the real audio-codec path is live in codec-less
    containers (the same move as ``png_decode_gray`` for images).
    Supports 16-bit and 8-bit PCM, any channel count.  Returns float64
    samples normalized to [-1, 1) — soundfile's default convention
    (int16/32768, (uint8-128)/128), so the two paths are value-identical
    on PCM files (parity is test-gated on soundfile's presence); shape
    (n,) mono, (n, ch) otherwise.  Raises ValueError on non-PCM — never
    a silent wrong answer."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            ch, sw, n = w.getnchannels(), w.getsampwidth(), w.getnframes()
            raw = w.readframes(n)
    except (wave.Error, EOFError) as e:  # truncated/non-PCM RIFF
        raise ValueError(f"not a decodable PCM WAV payload: {e}") from e
    if sw == 2:
        a = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned by spec
        a = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw} (want 1 or 2 bytes)")
    return a.reshape(-1, ch) if ch > 1 else a


def wav_encode_pcm(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Companion PCM16 encoder (stdlib ``wave``) for tests and fixtures.
    Integer input (int16 range) is written verbatim — encode → decode is
    then exactly ``samples / 32768``; float input is treated as
    normalized [-1, 1) and quantized."""
    import io
    import wave

    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError("wav_encode_pcm wants a 1-D or 2-D sample array")
    if np.issubdtype(a.dtype, np.floating):
        pcm = np.clip(np.floor(a * 32768.0 + 0.5), -32768, 32767).astype("<i2")
    else:
        if a.min() < -32768 or a.max() > 32767:
            raise ValueError("integer samples out of int16 range")
        pcm = a.astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(a.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def real_decode(payload: bytes, kind: str):
    """Decode a media payload into a numpy array: PIL/soundfile when
    installed; PNG images fall back to the vendored pure-python decoder
    (``png_decode_gray``) and PCM WAV audio to the stdlib ``wave``
    decoder (``wav_decode_pcm``), so both real-codec paths are live even
    in codec-less containers.  Raises NotImplementedError when no
    decoder applies — the clearly-marked stub boundary."""
    import io

    if kind == "image" and HAS_PIL:
        with _PILImage.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("L"), dtype=np.uint8)
    if kind == "image" and payload[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return png_decode_gray(bytes(payload))
    if kind == "audio" and HAS_SOUNDFILE:
        data, _sr = _soundfile.read(io.BytesIO(payload))
        return np.asarray(data)
    if kind == "audio" and payload[: len(_WAV_MAGIC)] == _WAV_MAGIC:
        return wav_decode_pcm(bytes(payload))
    raise NotImplementedError(
        f"no codec available for kind={kind!r} in this environment "
        f"(HAS_PIL={HAS_PIL}, HAS_SOUNDFILE={HAS_SOUNDFILE}, payload is "
        "not a PNG/WAV); extract_features uses the deterministic stub path"
    )


def _stub_feature(payload: bytes | None) -> list[float]:
    """Deterministic fake feature: byte-histogram moments. Stands in for a
    CNN/audio embedding so the distributed plumbing is fully exercisable."""
    if payload is None or len(payload) == 0:
        return [0.0] * FEATURE_DIM
    arr = np.frombuffer(payload, dtype=np.uint8)
    return [
        float(arr.mean()),
        float(arr.std()),
        float(arr.min()),
        float(arr.max()),
        float(np.percentile(arr, 25)),
        float(np.percentile(arr, 50)),
        float(np.percentile(arr, 75)),
        float(len(arr)),
    ]


def _codec_feature(payload: bytes | None, kind: str) -> list[float]:
    """Real-codec feature: decode via the optional library, then the same
    histogram-moment vector over decoded samples. Falls back to the stub
    when no codec applies or the payload doesn't parse."""
    if payload is None or len(payload) == 0:
        return [0.0] * FEATURE_DIM
    try:
        arr = np.ravel(real_decode(bytes(payload), kind))
    except Exception:  # NotImplementedError (no codec) or a bad payload
        return _stub_feature(payload)
    if arr.size == 0:
        return [0.0] * FEATURE_DIM
    arr = arr.astype(np.float64)
    return [
        float(arr.mean()),
        float(arr.std()),
        float(arr.min()),
        float(arr.max()),
        float(np.percentile(arr, 25)),
        float(np.percentile(arr, 50)),
        float(np.percentile(arr, 75)),
        float(arr.size),
    ]


def extract_features(
    df: DataFrame, batch_rows: int = 256, use_codec: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The iterator-of-batches signature means one Arrow batch in flight per
    task regardless of partition size — payload bytes never accumulate.
    With ``use_codec=True`` payloads are decoded through whichever optional
    codec library is installed (real_decode); otherwise (default, and
    whenever decode fails) the deterministic stub features are emitted.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                if use_codec:
                    feats = [
                        _codec_feature(p, k)
                        for p, k in zip(chunk["payload"], chunk["kind"])
                    ]
                else:
                    feats = [_stub_feature(p) for p in chunk["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "kind": chunk["kind"].values,
                        "n_bytes": [
                            len(p) if p is not None else 0 for p in chunk["payload"]
                        ],
                        "feature": feats,
                    }
                )

    return df.select("media_id", "kind", "payload").mapInPandas(fn, _FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"mime": f"{kind}/x-fake", "width": 64, "height": 64, "duration_ms": 1000},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_wav_media(spark, n: int = 32, seed: int = 11) -> DataFrame:
    """Deterministic REAL-audio media table: seeded int16 PCM noise of
    varying lengths encoded to valid WAVs via ``wav_encode_pcm`` — so the
    real audio decode path (``real_decode`` → soundfile or the stdlib
    ``wav_decode_pcm``) is exercisable end-to-end with no codec library.
    The generating sample arrays are reproducible from (n, seed) alone,
    letting an oracle recompute expected features without touching WAV."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        n_samp = 120 + (i % 9) * 41
        pcm = rng.integers(-32768, 32768, size=n_samp, dtype=np.int16)
        rows.append(
            (
                i,
                "audio",
                bytearray(wav_encode_pcm(pcm)),
                {
                    "mime": "audio/wav",
                    "width": None,
                    "height": None,
                    "duration_ms": int(n_samp * 1000 / 16000),
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synthetic_png_media(spark, n: int = 48, seed: int = 7) -> DataFrame:
    """Deterministic REAL-image media table: seeded grayscale arrays of
    varying shapes encoded to valid PNGs via ``png_encode_gray`` — so the
    real decode path (``real_decode`` → PIL or the vendored
    ``png_decode_gray``) is exercisable end-to-end with no codec library.
    The generating arrays are reproducible from (n, seed) alone, letting
    an oracle recompute expected features without touching PNG at all."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        h, w = 6 + (i % 7), 8 + (i % 5)
        arr = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        rows.append(
            (
                i,
                "image",
                bytearray(png_encode_gray(arr)),
                {"mime": "image/png", "width": w, "height": h, "duration_ms": None},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def template_png_arrays(
    seed: int = 19,
    n_random: int = 20,
    n_hot: int = 30,
    n_small: int = 4,
) -> dict:
    """Deterministic template-heavy grayscale corpus for exercising the
    hot-bucket ceiling of the fingerprint near-dup banding:

    - ids 0..n_random-1: independent random 16x20 images (background);
    - ids 100..100+n_hot-1: single-pixel perturbations of ONE template —
      the screenshot/thumbnail degenerate case that concentrates a chunk
      value into a bucket of ~n_hot members;
    - ids 200..200+n_small-1: perturbations of a second template — a
      small near-dup family that stays under a reasonable ceiling.

    Reproducible from the arguments alone so an oracle can recompute the
    fingerprints without touching PNG bytes."""
    rng = np.random.default_rng(seed)
    arrays = {}
    for i in range(n_random):
        arrays[i] = rng.integers(0, 256, size=(16, 20), dtype=np.uint8)
    hot = rng.integers(0, 256, size=(16, 20), dtype=np.uint8)
    for j in range(n_hot):
        a = hot.copy()
        r, c = (j * 2) % 14, (j * 3) % 17
        # a 2x3 block shift flips a few gradient signs — variants spread
        # over small nonzero hamming distances but still share the
        # template's untouched chunks (the hot buckets)
        a[r : r + 2, c : c + 3] = (a[r : r + 2, c : c + 3] + 96) % 256
        arrays[100 + j] = a
    small = rng.integers(0, 256, size=(16, 20), dtype=np.uint8)
    for j in range(n_small):
        a = small.copy()
        r, c = (j * 2) % 14, (j * 5) % 17
        a[r : r + 2, c : c + 2] = (a[r : r + 2, c : c + 2] + 64) % 256
        arrays[200 + j] = a
    return arrays


def synthetic_template_png_media(spark, seed: int = 19, **kwargs) -> DataFrame:
    """``template_png_arrays`` encoded to valid PNGs as a media table —
    the input for driving ``image_near_dup_pairs`` with an ACTIVE
    ``max_bucket_size`` ceiling end-to-end (decode → dhash → banding →
    ceiling → verify)."""
    rows = []
    for mid, arr in sorted(template_png_arrays(seed, **kwargs).items()):
        h, w = arr.shape
        rows.append(
            (
                mid,
                "image",
                bytearray(png_encode_gray(arr)),
                {"mime": "image/png", "width": w, "height": h, "duration_ms": None},
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize over binary payloads (mapInPandas).

    Real decode+resample is stubbed (no PIL in this container): the stub
    treats the payload as a raveled uint8 grid and nearest-neighbor
    subsamples it to width*height bytes — deterministic, and the Spark-side
    plumbing (schema, batch shape, payload-in/payload-out) is exactly what
    a real PIL/opencv kernel would use.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payloads = []
            for p in pdf["payload"]:
                if p is None or len(p) == 0:
                    out_payloads.append(b"")
                    continue
                arr = np.frombuffer(p, dtype=np.uint8)
                idx = np.linspace(0, len(arr) - 1, width * height).astype(np.int64)
                out_payloads.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "kind": pdf["kind"].values,
                    "payload": out_payloads,
                    "width": width,
                    "height": height,
                }
            )

    return df.filter(F.col("kind") == "image").select(
        "media_id", "kind", "payload"
    ).mapInPandas(fn, _RESIZE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(df: DataFrame, n_frames: int = 4, frame_bytes: int = 16) -> DataFrame:
    """Video frame sampling (mapInPandas, one row in → n_frames rows out).

    Stub decoder: the payload is sliced into ``n_frames`` evenly spaced
    windows of ``frame_bytes`` (a real ffmpeg kernel would emit JPEG
    frames); the explode-shaped output contract (media_id, frame_idx,
    frame) is the real one.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None or len(p) == 0:
                    continue
                arr = np.frombuffer(p, dtype=np.uint8)
                starts = np.linspace(0, max(len(arr) - frame_bytes, 0), n_frames).astype(
                    np.int64
                )
                for i, s in enumerate(starts):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(arr[s : s + frame_bytes].tobytes())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.filter(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        fn, _FRAME_SCHEMA
    )


# ------------------------------------------------------------ perceptual hash
def dhash_from_gray(arr: np.ndarray, grid: int = 8) -> int:
    """Difference hash of a grayscale array: area-mean-pool to
    ``grid`` x ``grid+1`` cells (np.array_split — deterministic, no
    resampling library), then bit r*grid+c is set iff cell[r, c+1] >
    cell[r, c]. A uniform brightness shift preserves every comparison, so
    re-encodes / gamma-shifted copies collapse to hamming 0-ish. Returned
    as SIGNED int64 (two's complement wrap) so it stores in a Spark
    LongType.

    Images smaller than the pooling grid (h < grid or w < grid+1) are
    nearest-neighbor upscaled via np.repeat first: otherwise array_split
    yields empty groups whose mean is NaN, forcing those bits to 0 —
    unrelated tiny images would then share many forced-zero bits and
    inflate false-positive near-dup pairs."""
    a = arr.astype(np.float64)
    h, w = a.shape[0], a.shape[1]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if h < grid:
        a = np.repeat(a, -(-grid // h), axis=0)
    if w < grid + 1:
        a = np.repeat(a, -(-(grid + 1) // w), axis=1)
    rows = np.array_split(a, grid, axis=0)
    cells = np.array(
        [[c.mean() for c in np.array_split(r, grid + 1, axis=1)] for r in rows]
    )
    bits = 0
    for r in range(grid):
        for c in range(grid):
            if cells[r, c + 1] > cells[r, c]:
                bits |= 1 << (r * grid + c)
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def image_dhash(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    grid: int = 8,
    batch_rows: int = 256,
) -> DataFrame:
    """Per-image perceptual fingerprint over binary payloads: PNG-decode
    (vendored pure-python codec — byte-identical to PIL on supported
    files) → ``dhash_from_gray``. mapInPandas with the same
    bounded-batch iterator shape as extract_features; rows whose payload
    doesn't decode yield NULL (kept, so callers see coverage).

    Output: (``id_col``, dhash BIGINT)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("dhash", T.LongType(), True),
        ]
    )
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"), F.col(payload_col).alias("_p")
    )

    def _hash(batches):
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["_p"]):
                try:
                    arr = png_decode_gray(bytes(payload))
                    out.append((int(mid), dhash_from_gray(arr, grid)))
                except Exception:
                    out.append((int(mid), None))
            yield pd.DataFrame(out, columns=["media_id", "dhash"])

    return src.mapInPandas(_hash, out_schema)


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    bands: int = 8,
    max_hamming: int = 6,
    grid: int = 8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Perceptual image near-dup pairs: dHash fingerprints → the generic
    hamming-banded candidate join (operators/dedup.py
    fingerprint_near_dup_pairs, the SimHash machinery) — re-encoded,
    brightness-shifted or lightly-noised copies land within
    ``max_hamming`` and must share a band chunk (pigeonhole), so the
    candidate set is bucket-bounded, never all-pairs. 100 TB shape:
    hashing is a narrow decode pass, the join is one equi-join on
    (band, chunk). ``max_bucket_size`` is the hot-bucket ceiling —
    screenshot/thumbnail-template corpora concentrate chunk values, and
    in-bucket pair expansion is quadratic in bucket size; see
    fingerprint_near_dup_pairs."""
    from .dedup import fingerprint_near_dup_pairs

    fps = image_dhash(df, id_col, payload_col, grid).filter(
        F.col("dhash").isNotNull()
    )
    return fingerprint_near_dup_pairs(
        fps, "media_id", "dhash", bits=grid * grid, bands=bands,
        max_hamming=max_hamming, max_bucket_size=max_bucket_size,
    )


def audio_fingerprint_from_samples(
    samples: np.ndarray, windows: int = 17, bands: int = 4
) -> int:
    """Haitsma-Kalker-style audio fingerprint (public algorithm — "A
    Highly Robust Audio Fingerprinting System", ISMIR 2002): frame the
    mono signal into ``windows`` equal windows, take per-window FFT
    magnitude split into ``bands`` log-spaced frequency bands, and set
    bit (w, b) iff band energy INCREASED from window w to w+1 — the sign
    of the temporal energy delta per band.  (windows-1) * bands bits,
    default 16*4 = 64.  Uniform amplitude scaling multiplies every energy
    equally, so gain-shifted copies collapse to hamming 0.  Returned as
    signed int64."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 2:
        a = a.mean(axis=1)
    if a.size < windows:  # too short to frame — degenerate fingerprint
        return 0
    frames = np.array_split(a, windows)
    energies = []
    for f in frames:
        mag = np.abs(np.fft.rfft(f))
        # drop DC, split the rest into log-spaced bands
        mag = mag[1:] if mag.size > 1 else mag
        if mag.size == 0:  # 1-sample frame: no AC content
            energies.append([0.0] * bands)
            continue
        edges = np.unique(
            np.round(np.logspace(0, np.log10(mag.size), bands + 1)).astype(int)
        )
        while edges.size < bands + 1:  # tiny frames: pad with linear cuts
            edges = np.unique(np.append(edges, edges[-1] + 1))
        energies.append(
            [float(np.sum(mag[edges[b]-1:edges[b+1]-1] ** 2)) for b in range(bands)]
        )
    bits = 0
    for w in range(windows - 1):
        for b in range(bands):
            if energies[w + 1][b] > energies[w][b]:
                bits |= 1 << (w * bands + b)
    return bits - (1 << 64) if bits >= 1 << 63 else bits


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    windows: int = 17,
    bands: int = 4,
) -> DataFrame:
    """Distributed audio fingerprints over binary WAV payloads
    (wav_decode_pcm — stdlib codec, soundfile-identical on PCM).
    Undecodable rows yield NULL, kept for coverage visibility.
    Output: (media_id, afp BIGINT)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("afp", T.LongType(), True),
        ]
    )
    src = df.select(
        F.col(id_col).cast("long").alias("media_id"), F.col(payload_col).alias("_p")
    )

    def _hash(batches):
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["_p"]):
                try:
                    a = wav_decode_pcm(bytes(payload))
                    out.append(
                        (int(mid), audio_fingerprint_from_samples(a, windows, bands))
                    )
                except Exception:
                    out.append((int(mid), None))
            yield pd.DataFrame(out, columns=["media_id", "afp"])

    return src.mapInPandas(_hash, out_schema)


def audio_near_dup_pairs(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    lsh_bands: int = 8,
    max_hamming: int = 6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Audio near-dup pairs: fingerprints → the generic hamming-banded
    candidate join (dedup.fingerprint_near_dup_pairs) — re-encoded or
    gain-shifted copies land within ``max_hamming`` and must share a
    band chunk, so candidates stay bucket-bounded, never all-pairs.
    ``max_bucket_size`` is the hot-bucket ceiling (silence-heavy audio
    concentrates fingerprints); see fingerprint_near_dup_pairs."""
    from .dedup import fingerprint_near_dup_pairs

    fps = audio_fingerprint(df, id_col, payload_col).filter(
        F.col("afp").isNotNull()
    )
    return fingerprint_near_dup_pairs(
        fps, "media_id", "afp", bits=64, bands=lsh_bands,
        max_hamming=max_hamming, max_bucket_size=max_bucket_size,
    )
