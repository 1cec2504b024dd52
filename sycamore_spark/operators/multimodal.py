"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Reference parity: ``ImageElement`` carries ``binary_representation`` plus
``image_size``/``image_mode``/``image_format`` properties (reference:
lib/sycamore/sycamore/data/element.py:143-203); ``SummarizeImages`` walks
image elements per doc (transforms/summarize_images.py:155). The reference
has no audio/video path — those extend the same pattern per the
training-data-pipeline scope.

Spark-first design (100 TB):
- Media is an opaque ``binary`` column + a typed ``media`` struct column
  (MEDIA_META_SCHEMA). Filters/joins/pruning run on the typed metadata —
  the binary payload is only touched inside Arrow-batched ``mapInPandas``
  stages and never shuffles unless the operator output needs it.
- Every decode/transform is an iterator-style ``mapInPandas`` so a real
  decoder (PIL/librosa/av) is loaded once per task, not per row — the
  Spark analogue of the reference's actor pools (transforms/base.py:130).
- Heavy codec libraries are absent in this container: each operator takes a
  ``backend`` — ``"auto"`` tries the real library and falls back,
  ``"fake"`` is a deterministic stand-in (stable functions of the bytes)
  that keeps schema/partitioning/batch plumbing real and testable,
  ``"real"`` raises NotImplementedError if the library is missing.
- Frame sampling multiplies row counts; it repartitions by a hash of
  (doc_id) AFTER the explode so downstream stages see balanced partitions
  even when a few videos dominate (skew isolation).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
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

# Built field-by-field (not fromDDL) so the module imports without an
# active SparkSession.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("kind", StringType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("duration_s", DoubleType()),
        StructField("size_bytes", LongType()),
    ]
)


def _try_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


def _resolve_backend(backend: str, lib) -> str:
    if backend == "real" and lib is None:
        raise NotImplementedError(
            "real media backend requested but the codec library is not installed"
        )
    if backend == "auto":
        return "real" if lib is not None else "fake"
    return backend


# -- deterministic fake codec ------------------------------------------------
# Pure functions of the payload bytes so tests and DuckDB oracles can
# reproduce them exactly: width/height/frames derive from octet length,
# frame payloads from md5(payload || ':' || index).

def fake_image_meta(payload: Optional[bytes]) -> dict:
    n = len(payload or b"")
    return {
        "kind": "image",
        "mime": "image/fake",
        "width": 16 + n % 640,
        "height": 16 + (n * 7) % 480,
        "mode": "RGB",
        "channels": 3,
        "sample_rate": None,
        "n_frames": None,
        "duration_s": None,
        "size_bytes": n,
    }


def fake_video_meta(payload: Optional[bytes]) -> dict:
    n = len(payload or b"")
    frames = 1 + n % 16
    return {
        "kind": "video",
        "mime": "video/fake",
        "width": 16 + n % 640,
        "height": 16 + (n * 7) % 480,
        "mode": None,
        "channels": 3,
        "sample_rate": None,
        "n_frames": frames,
        "duration_s": frames / 24.0,
        "size_bytes": n,
    }


def fake_audio_meta(payload: Optional[bytes]) -> dict:
    n = len(payload or b"")
    return {
        "kind": "audio",
        "mime": "audio/fake",
        "width": None,
        "height": None,
        "mode": None,
        "channels": 1 + n % 2,
        "sample_rate": 16000,
        "n_frames": None,
        "duration_s": n / 16000.0,
        "size_bytes": n,
    }


_FAKE_META = {"image": fake_image_meta, "video": fake_video_meta, "audio": fake_audio_meta}


def attach_media_meta(
    df: DataFrame,
    binary_col: str = "binary_representation",
    kind: str = "image",
    out_col: str = "media",
    backend: str = "auto",
) -> DataFrame:
    """Decode headers → typed ``media`` struct column.

    Real image path uses PIL header sniffing (cheap: no full decode);
    audio/video real paths are NotImplementedError stubs (codecs absent
    here) — the fake path keeps the schema contract identical.
    """
    pil = _try_pil() if kind == "image" else None
    mode = _resolve_backend(backend, pil if kind == "image" else None)
    fake = _FAKE_META[kind]
    # copy the field list — StructType shares it with df's cached schema,
    # and .add() mutates in place
    out_schema = StructType(list(df.schema.fields)).add(out_col, MEDIA_META_SCHEMA)
    names = [f.name for f in out_schema.fields]

    def run(it: Iterable[pd.DataFrame]):
        imagelib = _try_pil() if (mode == "real" and kind == "image") else None

        def meta(payload):
            if imagelib is not None:
                import io

                with imagelib.open(io.BytesIO(payload)) as im:
                    return {
                        "kind": "image",
                        "mime": f"image/{(im.format or 'raw').lower()}",
                        "width": im.width,
                        "height": im.height,
                        "mode": im.mode,
                        "channels": len(im.getbands()),
                        "sample_rate": None,
                        "n_frames": getattr(im, "n_frames", 1),
                        "duration_s": None,
                        "size_bytes": len(payload or b""),
                    }
            return fake(payload)

        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = [meta(p) for p in pdf[binary_col]]
            yield pdf[names]

    return df.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    binary_col: str = "binary_representation",
    media_col: str = "media",
    backend: str = "auto",
) -> DataFrame:
    """Resize every image payload; metadata is updated in both paths. The
    fake payload is md5(payload)||'WxH' — deterministic, size-stable, and
    cheap — while the real path re-encodes via PIL."""
    mode = _resolve_backend(backend, _try_pil())
    schema = df.schema
    names = df.columns

    def run(it: Iterable[pd.DataFrame]):
        imagelib = _try_pil() if mode == "real" else None

        def resize(payload, meta):
            if payload is None:
                return payload, meta
            if imagelib is not None:
                import io

                with imagelib.open(io.BytesIO(payload)) as im:
                    out = io.BytesIO()
                    im.resize((width, height)).save(out, format=im.format or "PNG")
                    payload = out.getvalue()
            else:
                payload = hashlib.md5(payload).digest() + f"{width}x{height}".encode()
            meta = dict(meta or {})
            meta.update(width=width, height=height, size_bytes=len(payload))
            return payload, meta

        for pdf in it:
            pdf = pdf.copy()
            pairs = [resize(p, m) for p, m in zip(pdf[binary_col], pdf[media_col])]
            pdf[binary_col] = [p for p, _ in pairs]
            pdf[media_col] = [m for _, m in pairs]
            yield pdf[names]

    return df.mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    binary_col: str = "binary_representation",
    media_col: str = "media",
    every_n: int = 1,
    backend: str = "auto",
    repartition: bool = True,
) -> DataFrame:
    """Explode each video into frame rows (id, frame_idx, frame_binary,
    width, height). Real decode (pyav/ffmpeg) is a NotImplementedError stub
    in this container; the fake frame payload is md5(payload||':'||idx).

    One input row fans out to n_frames/every_n rows, so the output is
    re-hashed across partitions to break per-video skew before downstream
    model stages."""
    if backend == "real":
        raise NotImplementedError("video decoding backend not available in this container")
    out_schema = StructType.fromDDL(
        f"{id_col} long, frame_idx int, frame_binary binary, width int, height int"
    )

    def run(it: Iterable[pd.DataFrame]):
        for pdf in it:
            out: dict[str, list] = {c: [] for c in (id_col, "frame_idx", "frame_binary", "width", "height")}
            for rid, payload, meta in zip(pdf[id_col], pdf[binary_col], pdf[media_col]):
                meta = meta or {}
                n = int(meta.get("n_frames") or 0)
                for i in range(0, n, every_n):
                    out[id_col].append(rid)
                    out["frame_idx"].append(i)
                    out["frame_binary"].append(
                        hashlib.md5(bytes(payload or b"") + f":{i}".encode()).digest()
                    )
                    out["width"].append(meta.get("width"))
                    out["height"].append(meta.get("height"))
            if out[id_col]:
                yield pd.DataFrame(out)

    frames = df.mapInPandas(run, schema=out_schema)
    if repartition:
        frames = frames.repartition(id_col, "frame_idx")
    return frames


def audio_features(
    df: DataFrame,
    binary_col: str = "binary_representation",
    n_features: int = 8,
    out_col: str = "audio_features",
    backend: str = "auto",
) -> DataFrame:
    """Fixed-width feature vector per audio payload (MFCC-shaped). Real
    path (librosa) is a stub here; fake features are bytes of
    md5(payload) scaled to [0,1] — deterministic and schema-true."""
    if backend == "real":
        raise NotImplementedError("audio feature backend not available in this container")
    out_schema = StructType(list(df.schema.fields)).add(out_col, ArrayType(DoubleType()))
    names = [f.name for f in out_schema.fields]

    def run(it: Iterable[pd.DataFrame]):
        def feats(payload):
            digest = hashlib.md5(bytes(payload or b"")).digest()
            return [digest[i % 16] / 255.0 for i in range(n_features)]

        for pdf in it:
            pdf = pdf.copy()
            pdf[out_col] = [feats(p) for p in pdf[binary_col]]
            yield pdf[names]

    return df.mapInPandas(run, schema=out_schema)
