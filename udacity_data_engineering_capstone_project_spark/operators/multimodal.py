"""Multimodal column plumbing.

Beyond-reference (BASELINE.json north star): image/audio/video payloads
ride through the engine as opaque ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, partition-friendly
layout, Arrow-batched ``mapInPandas`` feature extraction — is real and
tested; the actual media decoding is stubbed behind import guards
because codec libraries (PIL/librosa/av) are not in this container.

Design for 100 TB:
- payloads stay in one column; metadata is a narrow struct so pruning a
  metadata-only query never touches the blob column (columnar parquet
  prunes at the page level).
- feature extraction is ``mapInPandas`` (per-partition Arrow batches),
  NOT a row-at-a-time UDF — the only Python-side hop in the engine.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # codec libs are optional; plumbing works without them
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False


def attach_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    modality: str = "text",
) -> DataFrame:
    """Wrap a source column as an opaque binary payload + typed
    metadata struct: the canonical layout for multimodal rows.

    Output: (id, payload binary, meta struct<modality, n_bytes, fmt>).
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit(modality).alias("modality"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
        F.lit("utf-8").alias("fmt"),
    )
    return df.select(F.col(id_col), payload.alias("payload"), meta.alias("meta"))


def extract_payload_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via
    ``mapInPandas``: per batch, compute byte length and md5 digest.

    This is the template every real decoder follows: iterator of pandas
    batches in, narrow feature frame out, schema declared up front. The
    md5 here matches SQL ``md5`` on the source text, which is what
    makes the plumbing oracle-verifiable end to end.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "payload_md5": pdf[payload_col].map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        batches, schema=f"{id_col} long, n_bytes long, payload_md5 string"
    )


def decode_image(
    df: DataFrame, payload_col: str = "payload", target_size: tuple[int, int] = (224, 224)
) -> DataFrame:
    """Decode + resize image payloads to fixed-size pixel tensors.

    STUB: requires an image codec (PIL) that is not installed in this
    environment. The distributed shape is identical to
    :func:`extract_payload_features` — mapInPandas over binary batches,
    ``array<float>`` feature column out."""
    if not HAS_PIL:
        raise NotImplementedError(
            "image decoding requires PIL; not available in this environment. "
            "Spark-side plumbing (schema/batching) is covered by "
            "extract_payload_features."
        )
    raise NotImplementedError("real decode path intentionally deferred")


def frame_sample(
    df: DataFrame, payload_col: str = "payload", every_n_frames: int = 30
) -> DataFrame:
    """Sample frames from video payloads. STUB — no video codec in this
    environment; see :func:`decode_image` for the intended dataflow."""
    raise NotImplementedError(
        "video frame sampling requires a codec (av/ffmpeg); not available "
        "in this environment"
    )
