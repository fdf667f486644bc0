"""Multimodal (image/audio/video) column plumbing.

Opaque ``binary`` payload columns + typed metadata structs, processed with
Arrow-batched ``mapInPandas`` — the Spark-side plumbing (schema, batch
shape, partition sizing) is real and tested; the actual codec calls are
STUBBED (the image/audio libraries are not in this container) behind
``decode_stub`` which produces deterministic fake features.

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


def real_decode(payload: bytes, kind: str):
    """Decode a media payload into a numpy array using whichever optional
    codec library is installed (PIL for images, soundfile for audio).
    Raises NotImplementedError when the needed library is absent — the
    clearly-marked stub boundary."""
    import io

    if kind == "image" and HAS_PIL:
        with _PILImage.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("L"), dtype=np.uint8)
    if kind == "audio" and HAS_SOUNDFILE:
        data, _sr = _soundfile.read(io.BytesIO(payload))
        return np.asarray(data)
    raise NotImplementedError(
        f"no codec available for kind={kind!r} in this environment "
        f"(HAS_PIL={HAS_PIL}, HAS_SOUNDFILE={HAS_SOUNDFILE}); "
        "extract_features uses the deterministic stub path"
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
