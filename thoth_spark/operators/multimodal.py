"""Multimodal column plumbing: images/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via
``mapInPandas``.

The decode step is a clearly-marked STUB (the runtime has no image/audio
libraries): :func:`decode_stub` produces deterministic fake metadata from
the content's MD5 so the Spark-side plumbing — schema, batch iteration,
partition sizing — is real and testable end-to-end, while
:func:`decode_real` raises ``NotImplementedError`` with instructions.
Swap the per-batch function and nothing else changes.

At scale: binary payloads dominate partition size, so pipelines should
set ``spark.sql.files.maxPartitionBytes`` (or repartition by a size
estimate) so one Arrow batch of decoded frames fits executor memory;
metadata-only stages should select away the binary column FIRST so the
parquet reader never materializes the blobs (column pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: metadata schema attached by decode
MEDIA_META_SCHEMA = (
    "media_md5 string, media_bytes bigint, width int, height int,"
    " n_channels int, format string"
)


def attach_binary(df: DataFrame, source_col: str, media_col: str = "content") -> DataFrame:
    """Treat a column's bytes as the opaque media payload (demo plumbing:
    real pipelines read binary files via ``spark.read.format('binaryFile')``
    or parquet binary columns)."""
    return df.withColumn(media_col, F.encode(F.col(source_col), "utf-8"))


def decode(
    df: DataFrame,
    decoder: "Callable[[pd.Series], pd.DataFrame]",
    media_col: str = "content",
    meta_schema: str = MEDIA_META_SCHEMA,
) -> DataFrame:
    """Decode media blobs with an INJECTED per-batch decoder.

    ``decoder`` receives one Arrow batch's blobs as a ``pd.Series`` of
    ``bytes`` and returns a ``pd.DataFrame`` whose columns match
    ``meta_schema``. All Spark-side plumbing (schema handling, Arrow
    batching, distribution) lives here, so a real PIL/ffmpeg decoder is a
    one-liner for the caller — and the stub used in tests exercises the
    exact same path."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + meta_schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = decoder(pdf[media_col])
            meta.index = pdf.index
            yield pd.concat([pdf, meta], axis=1)

    return df.mapInPandas(run, schema=out_schema)


def stub_decoder(blobs: pd.Series) -> pd.DataFrame:
    """Deterministic fake image metadata from md5(content) — the default
    decoder while no codec libraries exist in the runtime."""
    md5s = [hashlib.md5(b).hexdigest() for b in blobs]
    return pd.DataFrame(
        {
            "media_md5": md5s,
            "media_bytes": [len(b) for b in blobs],
            # fake-but-deterministic dimensions from the digest
            "width": [16 + int(m[:2], 16) for m in md5s],
            "height": [16 + int(m[2:4], 16) for m in md5s],
            "n_channels": [1 + int(m[4], 16) % 4 for m in md5s],
            "format": [["png", "jpeg", "webp"][int(m[5], 16) % 3] for m in md5s],
        }
    )


def decode_stub(
    df: DataFrame, media_col: str = "content", batch_hint: int = 1024
) -> DataFrame:
    """STUB decode: :func:`decode` with :func:`stub_decoder` injected."""
    return decode(df, stub_decoder, media_col)


def decode_real(df: DataFrame, media_col: str = "content") -> DataFrame:
    """Real image decode — a thin injection of a PIL-backed decoder into
    :func:`decode`; raises when the codec library is absent."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "Image decoding requires Pillow, which is not available in this "
            "runtime. Inject any per-batch callable into decode() instead — "
            "the mapInPandas plumbing and schema stay identical."
        ) from exc

    def pil_decoder(blobs: pd.Series) -> pd.DataFrame:
        import io

        from PIL import Image

        rows = []
        for b in blobs:
            img = Image.open(io.BytesIO(b))
            rows.append(
                {
                    "media_md5": hashlib.md5(b).hexdigest(),
                    "media_bytes": len(b),
                    "width": img.width,
                    "height": img.height,
                    "n_channels": len(img.getbands()),
                    "format": (img.format or "unknown").lower(),
                }
            )
        return pd.DataFrame(rows)

    return decode(df, pil_decoder, media_col)


def frame_sample_stub(
    df: DataFrame, media_col: str = "content", every_n: int = 10
) -> DataFrame:
    """Video frame-sampling STUB: emits one row per sampled 'frame' with
    deterministic fake frame ids (demonstrates the 1→N mapInPandas
    explode shape used by real frame extraction)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", frame_idx int, frame_md5 string"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                blob = row[media_col]
                n_frames = 1 + len(blob) // max(every_n, 1)
                for i in range(min(n_frames, 8)):
                    r = dict(row)
                    r["frame_idx"] = i
                    r["frame_md5"] = hashlib.md5(blob + str(i).encode()).hexdigest()
                    rows.append(r)
            yield pd.DataFrame(rows)

    return df.mapInPandas(sample, schema=out_schema)
