"""Multimodal column pattern — opaque binary payloads + typed metadata
(north-star surface).

Images/audio/video ride through the pipeline as ``binary`` columns
with a metadata struct alongside; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas functions over
``mapInPandas``. Media codecs are not available in this container, so
the decode step is STUBBED (clearly marked below): the Spark-side
plumbing — schema, batch shape, partitioning — is real and tested,
and the deterministic fake keeps results oracle-checkable.

Scale notes: binary payloads make rows wide — keep
``spark.sql.files.maxPartitionBytes`` moderate, project the blob away
as soon as metadata is extracted, and never pass blobs through a
shuffle you don't need (extract first, then join on the id).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def attach_blob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Pack a payload column as binary + a metadata struct — the
    multimodal carrier shape. (Here the payload is UTF-8 text; in
    production it is image/audio bytes from object storage.)"""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("blob"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.col(text_col)).cast("long").alias("declared_bytes"),
        ).alias("media_meta"),
    )


def decode_image(blob: bytes):
    """Real image decode — requires an imaging library not present in
    this container. STUB: see :func:`extract_media_meta` for the
    deterministic fake used by tests/oracles."""
    raise NotImplementedError(
        "image decode requires PIL/opencv, not available in this environment; "
        "use extract_media_meta (deterministic fake) for plumbing tests"
    )


_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def extract_media_meta(blobs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    The decode itself is a DETERMINISTIC FAKE (byte-length arithmetic
    standing in for a real header parse) so the Spark plumbing —
    mapInPandas signature, batch shape, output schema — is exercised
    and the result stays oracle-checkable:

        n_bytes = len(blob); width = n_bytes % 640;
        height = (n_bytes * 7) % 480
    """

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            n = pdf["blob"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": n,
                    "width": n % 640,
                    "height": (n * 7) % 480,
                }
            )

    return blobs.mapInPandas(extract, schema=_META_SCHEMA)


def extract_features(
    blobs: DataFrame, id_col: str = "doc_id", *, dim: int = 16
) -> DataFrame:
    """Feature extraction over binary payloads → fixed-dim embedding
    (the encoder seam: in production a vision/audio model batch runs
    here; see the LLM-backend seam shape in operators/classify.py).

    The encoder is a DETERMINISTIC FAKE so the downstream ANN plumbing
    stays oracle-checkable end-to-end: with c = md5(blob) hex,

        v[d] = ((int(md5(c || ':' || d)[:8], 16) % 2001) − 1000) / 1000

    i.e. pure md5/int arithmetic that DuckDB reproduces exactly.
    Identical payloads get identical vectors (the property the
    near-dup path needs); values are exact multiples of 1/1000, so the
    SRP integer scaling downstream stays exact too."""

    def encode(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            vecs = []
            for blob in pdf["blob"]:
                c = hashlib.md5(bytes(blob)).hexdigest()
                vecs.append(
                    [
                        (int(hashlib.md5(f"{c}:{d}".encode()).hexdigest()[:8], 16)
                         % 2001 - 1000) / 1000.0
                        for d in range(dim)
                    ]
                )
            yield pd.DataFrame({id_col: pdf[id_col], "features": vecs})

    # preserve the caller's id column name and type (any id type works —
    # the id passes through the Arrow batch untouched)
    id_type = blobs.schema[id_col].dataType.simpleString()
    return blobs.select(F.col(id_col), F.col("blob")).mapInPandas(
        encode, schema=f"{id_col} {id_type}, features array<double>"
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_offset", T.LongType()),
        T.StructField("frame_hash", T.StringType()),
    ]
)


def sample_frames(blobs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Frame sampling over binary media payloads — the UDTF-shaped
    multimodal op: one input row fans out to n_frames output rows via
    ``mapInPandas`` (variable-arity output is exactly what mapInPandas
    is for; a scalar pandas_udf could not change cardinality).

    The frame decode is a DETERMINISTIC FAKE (real codecs are not in
    this container): n_frames = n_bytes % 5 + 1, frames evenly strided,
    frame content stood in by md5(doc_id:frame_idx). The Spark
    plumbing — fan-out schema, Arrow batching, blob projected away
    before any shuffle — is the real pattern."""

    def explode_frames(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_hash": []}
            for doc_id, blob in zip(pdf[id_col], pdf["blob"]):
                n = len(blob)
                n_frames = n % 5 + 1
                stride = n // n_frames
                for i in range(n_frames):
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(i * stride)
                    out["frame_hash"].append(
                        hashlib.md5(f"{int(doc_id)}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return blobs.select(F.col(id_col), F.col("blob")).mapInPandas(
        explode_frames, schema=_FRAME_SCHEMA
    )
