"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as binary columns with a metadata
struct (modality, byte length, content hash). The Spark-side plumbing —
schema, partitioning, Arrow batch shape, mapInPandas UDF signatures — is
real and tested; the actual codec step is STUBBED (``decode_payload`` raises
NotImplementedError) because media libraries are not available in this
environment. ``extract_features`` demonstrates the deterministic
feature-extraction path end-to-end with a byte-level fake extractor shaped
exactly like a real one (fixed-size float vector per asset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .relational import ld

FEATURE_DIM = 8


def attach_binary_payload(spark, sf_dir) -> DataFrame:
    """Manufacture a binary asset column from document text (UTF-8 bytes)
    plus the typed metadata struct a real media table would carry."""
    d = ld(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("modality"),
            F.length(payload).alias("n_bytes"),
            F.crc32(payload).alias("checksum"),
        ).alias("asset_meta"),
    )


def multimodal_metadata(spark, sf_dir) -> DataFrame:
    """Oracle-checkable slice of the binary plumbing: byte lengths survive
    the encode → binary → metadata path."""
    df = attach_binary_payload(spark, sf_dir)
    return df.select("doc_id",
                     F.col("asset_meta.modality").alias("modality"),
                     F.col("asset_meta.n_bytes").alias("n_bytes"))


ORACLE_MULTIMODAL_META = """
SELECT doc_id, 'text/plain' AS modality, octet_length(encode(text)) AS n_bytes
FROM documents
"""


def decode_payload(fmt: str):
    """STUB: real deployments plug a codec here (PIL / torchaudio / pyav).

    Kept as an explicit NotImplementedError so the pipeline shape is honest:
    the surrounding plumbing (binary column in, decoded tensor out via
    mapInPandas) is what this module actually ships.
    """
    raise NotImplementedError(
        f"media codec for {fmt!r} not available in this environment; "
        "plug a decoder into extract_features(decoder=...)")


def _default_fake_decoder(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode+embed: fixed-size byte statistics.

    Shaped exactly like a real extractor (bytes → float[FEATURE_DIM]) so the
    Spark plumbing (Arrow batching, schema, partition parallelism) is fully
    exercised.
    """
    n = len(payload) or 1
    buckets = [0.0] * FEATURE_DIM
    for i, byte in enumerate(payload):
        buckets[i % FEATURE_DIM] += byte
    return [b / n for b in buckets]


def extract_features(df: DataFrame, decoder=None) -> DataFrame:
    """Batch feature extraction over binary payloads via mapInPandas.

    One Arrow batch in → one Arrow batch out; the decoder runs per asset
    inside the batch loop (vectorize inside the decoder when the codec
    allows). Partition count carries over, so a 100 TB asset table keeps
    its read parallelism through extraction.
    """
    import pandas as pd

    decode = decoder or _default_fake_decoder

    def run(batches):
        for pdf in batches:
            feats = [decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "features": feats,
            })

    return df.mapInPandas(run, schema=f"doc_id long, features array<double>")


def resize_assets(df: DataFrame, target: tuple[int, int] = (64, 64),
                  resizer=None) -> DataFrame:
    """Resize plumbing over binary image payloads via mapInPandas.

    The real resizer (PIL/cv2) is not available here, so the default is a
    deterministic fake with the exact signature a codec adapter needs:
    bytes → (bytes, width, height). The Spark side — Arrow batching,
    schema with typed dimensions, partition-preserving map — is the part
    this module ships for real; swap ``resizer`` for the codec in prod.
    """
    import pandas as pd

    w, h = target

    def fake_resize(payload: bytes) -> bytes:
        # deterministic "resample": stride-sample the byte stream to w*h
        n = max(1, len(payload))
        stride = max(1, n // (w * h))
        return bytes(payload[::stride][: w * h])

    resize = resizer or fake_resize

    def run(batches):
        for pdf in batches:
            out = [resize(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": out,
                "width": [w] * len(pdf),
                "height": [h] * len(pdf),
            })

    return df.mapInPandas(
        run, schema="doc_id long, payload binary, width int, height int")


def sample_frames(df: DataFrame, every_nth: int = 10,
                  frame_size: int = 256, sampler=None) -> DataFrame:
    """Frame-sampling plumbing for video-shaped payloads: one input row →
    N frame rows (the explode-shaped mapInPandas; output cardinality is
    data-dependent, which is why this is not a pandas_udf).

    Default sampler treats the payload as fixed-size frames and keeps every
    ``every_nth`` one — deterministic, shaped exactly like a container
    demuxer (bytes → [(frame_idx, frame_bytes)]).
    """
    import pandas as pd

    def fake_sampler(payload: bytes):
        frames = [payload[i:i + frame_size]
                  for i in range(0, len(payload), frame_size)]
        return [(i, f) for i, f in enumerate(frames) if i % every_nth == 0]

    sample = sampler or fake_sampler

    def run(batches):
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for idx, frame in sample(bytes(payload)):
                    ids.append(doc_id)
                    idxs.append(idx)
                    blobs.append(frame)
            yield pd.DataFrame({
                "doc_id": ids, "frame_idx": idxs, "frame": blobs})

    return df.mapInPandas(
        run, schema="doc_id long, frame_idx int, frame binary")


def multimodal_features(spark, sf_dir) -> DataFrame:
    """Full plumbing demo: text → binary payload → mapInPandas extraction →
    per-asset feature vector norm (rows-only driver check; pytest asserts
    determinism and batch-shape invariants)."""
    assets = attach_binary_payload(spark, sf_dir)
    feats = extract_features(assets.select("doc_id", "payload"))
    norm = F.sqrt(F.aggregate(
        F.transform("features", lambda x: x * x), F.lit(0.0),
        lambda acc, v: acc + v))
    return feats.select("doc_id", norm.alias("feature_norm")).orderBy("doc_id")
