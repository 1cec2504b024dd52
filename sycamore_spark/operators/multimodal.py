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


# -- file format conversion (reference utils/fileformat_tools.py) ------------

def file_extension_expr(path_col) -> "F.Column":
    """Native twin of the reference's ``get_file_extension``
    (reference utils/fileformat_tools.py:61-66): the suffix (with dot) of
    the path's final component, after stripping s3/http(s) URL query/
    fragment parts. Empty string when the name has no dot (Path.suffix
    semantics; a lone leading dot like ``.bashrc`` is a name, not a
    suffix). Pure Column expression — runs in codegen."""
    p = F.col(path_col) if isinstance(path_col, str) else path_col
    scheme = F.regexp_extract(p, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    stripped = F.when(
        F.lower(scheme).isin("s3", "http", "https"),
        F.regexp_replace(
            F.regexp_replace(F.regexp_replace(p, r"[?#].*$", ""), r"^[^:]+://", ""),
            r"^[^/]*", "",
        ),
    ).otherwise(p)
    name = F.element_at(F.split(stripped, "/"), -1)
    return F.when(
        name.rlike(r"^.+\.[^.]+$") & ~name.rlike(r"^\.[^.]*$"),
        F.regexp_extract(name, r"(\.[^.]+)$", 1),
    ).otherwise(F.lit(""))


def image_page_filename_expr(path_col, page_col) -> "F.Column":
    """Native twin of the reference's ``image_page_filename_fn``
    (reference utils/image_utils.py:77-81):
    ``{basename_without_ext}_page_{page}.png``, with the same
    ``".".join(name.split(".")[:-1])`` base rule as the HTML-table
    filenames (extension-less name -> empty base)."""
    p = F.col(path_col) if isinstance(path_col, str) else path_col
    g = F.col(page_col) if isinstance(page_col, str) else page_col
    name = F.element_at(F.split(p, "/"), -1)
    base = F.when(
        name.contains("."), F.regexp_replace(name, r"\.[^.]*$", "")
    ).otherwise(F.lit(""))
    return F.concat(base, F.lit("_page_"), g.cast("string"), F.lit(".png"))


def crop_box_expr(bbox_col, width_col, height_col, padding: int = 10) -> "F.Column":
    """Native crop-box arithmetic of the reference's ``crop_to_bbox``
    (reference utils/image_utils.py:18-35): relative bbox [x1,y1,x2,y2]
    scaled to pixel space with ``padding`` added outward on all four
    sides. The decode+crop itself is the PIL-gated part (absent in this
    container); the geometry — the part every crop pipeline shuffles and
    filters on — is exact Column math and is what this returns:
    array(x1*W - p, y1*H - p, x2*W + p, y2*H + p)."""
    b = F.col(bbox_col) if isinstance(bbox_col, str) else bbox_col
    w = (F.col(width_col) if isinstance(width_col, str) else width_col).cast("double")
    h = (F.col(height_col) if isinstance(height_col, str) else height_col).cast("double")
    pad = F.lit(float(padding))
    return F.array(
        F.element_at(b, 1) * w - pad,
        F.element_at(b, 2) * h - pad,
        F.element_at(b, 3) * w + pad,
        F.element_at(b, 4) * h + pad,
    )


def _default_pdf_converter(source_path: str, out_dir: str) -> None:
    """LibreOffice headless conversion, exactly the reference's
    ``run_libreoffice`` invocation (utils/fileformat_tools.py:20-33);
    honestly gated when the binary is absent."""
    import shutil
    import subprocess
    from tempfile import TemporaryDirectory

    if shutil.which("libreoffice") is None:
        raise NotImplementedError(
            "libreoffice is not installed in this container; pass converter= "
            "to convert_binary_to_pdf (reference fileformat_tools requires a "
            "manual LibreOffice install the same way)"
        )
    with TemporaryDirectory() as temp_dir:
        subprocess.run(
            [
                "libreoffice", "--headless", "--convert-to", "pdf",
                source_path, "--outdir", out_dir,
                f"-env:UserInstallation=file://{temp_dir}",
            ],
            check=True,
        )


def convert_binary_to_pdf(
    df: DataFrame,
    converter=None,
    binary_col: str = "binary",
    path_col: str = "path",
) -> DataFrame:
    """Convert each row's binary payload to PDF through an office-suite
    converter — the reference's ``binary_representation_to_pdf``
    (reference utils/fileformat_tools.py:13-58), distributed: the
    temp-file round trip (write payload with its source extension, run
    the converter, read back ``{stem}.pdf``) happens per row inside an
    Arrow-batched ``mapInPandas`` stage, so one converter process chain
    per task, never on the driver. Replaces ``binary_col`` with the PDF
    bytes and adds ``filetype = application/pdf`` — the reference's
    property update.

    ``converter(source_path, out_dir)`` defaults to the reference's
    headless LibreOffice invocation (NotImplementedError when absent, as
    in the container); tests inject deterministic converters. At 100 TB
    the stage is pure per-row CPU — no shuffle, scales with executors;
    pair with a `fan_out` when reading few large binary files.
    """
    from sycamore_spark.functions.partitioning import fan_out

    conv = converter or _default_pdf_converter
    ext_col = "_src_ext"
    # per-row temp-file IO is the cost: widen a single-file extract so the
    # converter chain runs on every core (cluster no-op)
    with_ext = fan_out(df).withColumn(ext_col, file_extension_expr(path_col))
    out_fields = [f for f in with_ext.schema.fields if f.name != ext_col]
    out_schema = StructType(out_fields + [StructField("filetype", StringType())])
    names = [f.name for f in out_fields]

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        import os
        from pathlib import Path
        from tempfile import NamedTemporaryFile

        for pdf in batches:
            payloads = []
            for raw, ext in zip(pdf[binary_col], pdf[ext_col]):
                if raw is None:
                    raise ValueError("binary payload is required for PDF conversion")
                with NamedTemporaryFile(suffix=ext or "") as tmp:
                    tmp.write(bytes(raw))
                    tmp.flush()
                    tmp_path = Path(tmp.name)
                    conv(str(tmp_path), str(tmp_path.parent))
                    out_path = tmp_path.parent / f"{tmp_path.stem}.pdf"
                    payloads.append(out_path.read_bytes())
                    os.unlink(out_path)
            res = pdf[names].copy()
            res[binary_col] = payloads
            res["filetype"] = "application/pdf"
            yield res

    return with_ext.mapInPandas(run, schema=out_schema)
