"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction / resize / frame-sampling run
as Arrow-batched ``mapInPandas`` stages. The decode libraries (PIL,
ffmpeg, ...) are not in this container, so the actual codec call is STUBBED
behind ``decoder=`` — the Spark-side plumbing (schema, batch iteration,
partition-parallel execution, deterministic fake features for testing) is
real and tested.

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


def resize_stub(*_args, **_kwargs):
    """Image resize requires a codec library not present in this container."""
    raise NotImplementedError(
        "image resize requires PIL/opencv which are not available in this "
        "environment; wire a decoder into decode_features() instead"
    )


def frame_sample_stub(*_args, **_kwargs):
    """Video frame sampling requires ffmpeg, not present in this container."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg which is not available in this "
        "environment; wire a decoder into decode_features() instead"
    )
