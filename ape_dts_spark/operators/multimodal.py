"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with typed metadata, processed by
Arrow-batched `mapInPandas` pipelines.  The actual codec step is STUBBED
(this container has no image/audio libraries): `decode_stub=True` derives
deterministic fake features from the bytes themselves, so the Spark-side
plumbing — schema, batch iteration, partitioning, UDF signatures — is real
and fully tested, and swapping in PIL/ffmpeg later only changes the body of
`_decode_one`.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("digest", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def _decode_one(payload: bytes) -> tuple[int, int, int, bool]:
    """STUB decode. Real implementation would be e.g.:
        from PIL import Image; im = Image.open(io.BytesIO(payload))
        return im.width, im.height, getattr(im, 'n_frames', 1), True
    Here: deterministic fake dimensions from a content digest."""
    if not payload:
        return 0, 0, 0, False
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 1 + h[2] % 8, True


def media_metadata(
    docs: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Extract typed metadata from binary media columns via mapInPandas.

    Arrow-batched: each pandas chunk is processed in one Python call; the
    per-item decode is unavoidable for codecs (same shape PIL would have)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nbytes, digests, ws, hs, fr, ok = [], [], [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                w, h, f, good = _decode_one(b)
                ids.append(i)
                nbytes.append(len(b))
                digests.append(hashlib.md5(b).hexdigest() if b else None)
                ws.append(w)
                hs.append(h)
                fr.append(f)
                ok.append(good)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": nbytes,
                    "digest": digests,
                    "width": ws,
                    "height": hs,
                    "n_frames": fr,
                    "decode_ok": ok,
                }
            )

    return docs.select(F.col(id_col), F.col(payload_col)).mapInPandas(run, MEDIA_META_SCHEMA)


def frame_sample_plan(
    meta: DataFrame, every_n: int = 2, max_frames: int = 4
) -> DataFrame:
    """Plan which frames to sample per media item (decode-free, JVM-side):
    one output row per (doc_id, frame_idx)."""
    idxs = F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
    return (
        meta.filter(F.col("decode_ok"))
        .select("doc_id", F.explode(F.slice(idxs, 1, max_frames)).alias("frame_idx"))
    )
