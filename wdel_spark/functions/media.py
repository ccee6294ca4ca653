"""Multimodal column plumbing: opaque binary media + typed metadata.

The corpus interleaves ``media`` spans (``media_ref`` URIs).  At scale the
referenced payloads live in an object store; the Spark-side contract is:

    media(doc_id string, span_idx int, media_ref string,
          content binary, meta struct<mime:string, n_bytes:long>)

Feature extraction (decode / resize / frame-sample) runs as Arrow-batched
``mapInPandas`` over the binary column.  The real decoders (PIL/ffmpeg)
are NOT in this container, so the decode step is stubbed behind
``WDEL_SPARK_REAL_DECODE`` — the *plumbing* (schema, batching, partition
shape, UDF signature) is real and tested; the stub emits deterministic
pseudo-features (md5 of the payload) so tests are hermetic.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "doc_id string, span_idx int, media_ref string, content binary, "
    "meta struct<mime:string, n_bytes:long>"
)

FEATURE_SCHEMA = (
    "doc_id string, span_idx int, media_ref string, feature_id string, "
    "n_bytes long, width int, height int"
)

REAL_DECODE = False  # flip when PIL/ffmpeg are available in the image


def media_table_from_documents(documents: DataFrame) -> DataFrame:
    """Derive the media table from the documents' media spans.

    Payload bytes are synthesized deterministically from the ref (the
    sandbox has no object store); in production this column is loaded by a
    binary-file datasource or an Iceberg table with a blob column."""
    m = (
        documents.select(
            "doc_id", F.posexplode("spans").alias("span_idx", "span"))
        .where(F.col("span.kind") == "media")
        .select("doc_id", "span_idx",
                F.col("span.media_ref").alias("media_ref"))
    )
    content = F.encode(F.md5(F.col("media_ref")), "utf-8").cast("binary")
    return m.select(
        "doc_id", "span_idx", "media_ref", content.alias("content"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.length(content).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_stub(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for image decode: (feature_id, w, h).

    Real path (PIL.Image.open -> resize -> embed) raises until the
    container ships decoders."""
    if REAL_DECODE:
        raise NotImplementedError(
            "real image decode requires PIL/ffmpeg; not in this container")
    h = hashlib.md5(payload).hexdigest()
    return h[:16], int(h[16:18], 16) + 1, int(h[18:20], 16) + 1


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column."""

    def run(batches):
        for pdf in batches:
            feats = [_decode_stub(bytes(b)) for b in pdf["content"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "span_idx": pdf["span_idx"],
                "media_ref": pdf["media_ref"],
                "feature_id": [f[0] for f in feats],
                "n_bytes": [len(bytes(b)) for b in pdf["content"]],
                "width": [f[1] for f in feats],
                "height": [f[2] for f in feats],
            })

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
