"""Multimodal (binary) column plumbing.

Convention: media rides as an opaque ``binary`` column plus a typed
metadata struct — the schema the brief prescribes for image/audio/video
at 100 TB. The fixture set has no real media, so ``documents.text`` is
encoded to bytes to exercise the REAL parts — schema, Arrow batch
transfer, ``mapInPandas`` signature, partition shape — while the decode
step itself is stubbed:

- if a decoder library (PIL) is importable, ``decode_image_meta`` would
  use it (not in this container);
- otherwise a clearly-marked deterministic fake derives features from the
  raw bytes (length + md5-prefix checksum), keeping outputs
  oracle-checkable.

Scale notes: ``mapInPandas`` streams Arrow record batches — constant
memory per task regardless of partition size; binary payloads stay in
the JVM until the Arrow hop, and column pruning drops them entirely when
a query touches only metadata.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: Output schema of the feature extractor (typed metadata struct,
#: flattened).
MEDIA_FEATURES_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, checksum BIGINT, decoder STRING"
)

try:  # real decoder path — absent in this container
    from PIL import Image  # noqa: F401

    _HAVE_DECODER = True
except ImportError:
    _HAVE_DECODER = False


def attach_binary(df: DataFrame, text_col: str = "text",
                  out_col: str = "media") -> DataFrame:
    """Materialize an opaque binary column (stand-in for image/audio
    payloads) + minimal metadata struct."""
    binary = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("application/octet-stream").alias("mime"),
        F.length(binary).alias("n_bytes"),
    )
    return df.withColumn(out_col, binary).withColumn(f"{out_col}_meta", meta)


def _fake_decode(buf: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a media decoder: byte length + 24-bit
    md5 checksum. A real deployment swaps this for PIL/ffmpeg/soundfile;
    the Spark-side contract (bytes in, scalar features out) is identical.
    """
    return len(buf), int(hashlib.md5(buf).hexdigest()[:6], 16)


def decode_image_meta(buf: bytes) -> tuple[int, int]:
    """Decode one media payload to features. STUB: raises if a real
    decoder is expected but unavailable; tests use the deterministic
    fake via extract_media_features."""
    if _HAVE_DECODER:
        raise NotImplementedError(
            "real decode path not wired in this container"
        )
    return _fake_decode(buf)


def extract_media_features(df: DataFrame, media_col: str = "media",
                           id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` so one Python worker handles a whole Arrow batch —
    the vectorized path the §2.11 UDF SDK maps to, never per-row UDFs.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [_fake_decode(b) for b in pdf[media_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": [f[0] for f in feats],
                    "checksum": [f[1] for f in feats],
                    "decoder": "fake-deterministic",
                }
            )

    return df.select(id_col, media_col).mapInPandas(
        batches, schema=MEDIA_FEATURES_SCHEMA
    )
