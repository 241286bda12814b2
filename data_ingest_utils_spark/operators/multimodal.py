"""Multimodal columns: opaque binary payloads + typed metadata.

100 TB design (task brief): media columns are POINTERS + metadata, not
inline blobs — the parquet row holds (uri, byte_size, sha256, modality)
and small payloads only; decode/feature-extraction runs as Arrow-
batched ``mapInPandas`` so bytes never round-trip through Python
row-by-row.  The decode step itself is STUBBED (no image/audio libs in
this container): ``decode_stub=True`` produces a deterministic fake
feature vector from the payload hash; ``decode_stub=False`` raises
NotImplementedError where a real libjpeg/ffmpeg call would go.  The
Spark-side plumbing — schema, batching, partitioning — is real and
tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Output schema of the (stubbed) feature extractor.
FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def pack_payload(df: DataFrame, text_col: str = "text", uri_prefix: str = "mem://doc/") -> DataFrame:
    """Attach a binary payload column + metadata struct.

    The fixture has no real media, so the document text doubles as the
    payload bytes; the struct carries (uri, n_bytes, sha256, modality)
    — exactly the pointer-not-blob record a 100 TB pipeline stores.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.concat(F.lit(uri_prefix), F.col("doc_id").cast("string")).alias("uri"),
            F.octet_length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
            F.lit("text/plain").alias("modality"),
        ),
    )


def extract_features(
    df: DataFrame, decode_stub: bool = True, dim: int = 4
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas``: each batch arrives as a pandas DataFrame of
    payload bytes; a real implementation would decode (PIL/ffmpeg) and
    run a feature net here.  The stub derives a deterministic
    pseudo-feature from the sha256 so tests can assert the plumbing
    (schema, batch shape, partition parallelism) end-to-end.
    """
    # validate at call time: the stub slices the 64-char sha256 hex
    # digest in 8-char windows, so dim > 8 would raise
    # int('', 16) ValueError inside every Arrow task instead of here
    if not 1 <= dim <= 8:
        raise ValueError(f"dim={dim} must be in [1, 8] (64-bit digest / 8 hex chars)")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires image/audio libs not present "
                    "in this container; run with decode_stub=True"
                )
            shas = []
            feats = []
            for payload in pdf["payload"]:
                digest = hashlib.sha256(bytes(payload)).hexdigest()
                shas.append(digest)
                feats.append(
                    [int(digest[8 * i : 8 * i + 8], 16) / 0xFFFFFFFF for i in range(dim)]
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload_sha": shas, "feature": feats}
            )

    return df.select("doc_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


#: Output schema of the frame sampler: one row per SAMPLED frame.
FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 256,
    every: int = 4,
    decode_stub: bool = True,
) -> DataFrame:
    """Frame-sample a media payload: split into fixed-size frames, keep
    every ``every``-th, emit one row per sampled frame (1→N batch
    expansion through ``mapInPandas``).

    The stub treats the payload bytes as the 'video' — frame i is the
    byte slice [i*frame_bytes, (i+1)*frame_bytes); a real decoder
    (ffmpeg keyframe extraction) replaces the slicing only, so the
    Spark-side shape (Arrow batches in, multi-row batches out, schema,
    partition parallelism) is the production plumbing.  Deterministic
    ⇒ fully oracle-checkable despite running in Python.
    """
    # Fail fast at CALL time — inside the closure these surface as an
    # opaque per-task PythonException (range() step 0 /
    # ZeroDivisionError) only after the job has scanned and shipped
    # payload batches (same policy as extract_features' dim check).
    if every <= 0:
        raise ValueError(f"every={every} must be >= 1")
    if frame_bytes <= 0:
        raise ValueError(f"frame_bytes={frame_bytes} must be >= 1")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame decode requires ffmpeg/image libs not present "
                    "in this container; run with decode_stub=True"
                )
            ids, idxs, shas = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = (len(raw) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every):
                    ids.append(doc_id)
                    idxs.append(i)
                    shas.append(
                        hashlib.sha256(
                            raw[i * frame_bytes : (i + 1) * frame_bytes]
                        ).hexdigest()
                    )
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_sha": shas})

    return df.select("doc_id", "payload").mapInPandas(batches, FRAME_SCHEMA)
