"""Multimodal column plumbing: image/audio/video as opaque binary
payloads with typed metadata, processed by Arrow-batched pandas
UDFs over mapInPandas.

The decode step itself is STUBBED (no media libraries in this
environment — see `decode_image`), but everything Spark-side is
real and tested: the binary schema, the mapInPandas batch shape,
deterministic feature extraction on the raw bytes, and the
partitioning story (payloads stay distributed; only features come
back to the driver).

Scale notes: payload bytes never hit the driver. mapInPandas
processes Arrow record batches, so per-batch Python overhead is
amortized over thousands of rows; heavy decode would run with
spark.sql.execution.arrow.maxRecordsPerBatch tuned so a batch of
decoded frames fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, payload_md5 string, first_byte int"
)


def to_media(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into a binary-payload media table
    (payload = utf-8 bytes of the text; a stand-in for image bytes)."""
    return docs.select(
        "doc_id",
        F.col("text").cast("binary").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )


def payload_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over raw bytes: size, md5,
    first byte. This is the real dataflow a decode step rides on.
    A NULL payload (payload/text are nullable in the schemas)
    propagates as NULL features — matching the SQL oracle's null
    semantics — instead of raising in the Python worker and killing
    the stage."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pd.array(
                        [None if b is None else len(b) for b in payloads],
                        dtype="Int64",
                    ),
                    "payload_md5": payloads.map(
                        lambda b: None
                        if b is None
                        else hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "first_byte": pd.array(
                        [
                            None
                            if b is None
                            else (int(b[0]) if len(b) else -1)
                            for b in payloads
                        ],
                        dtype="Int32",
                    ),
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """Image decode behind a runtime feature flag: when Pillow is
    importable IN THE WORKER the payload is really decoded (width/
    height from PIL.Image.open); otherwise the deterministic fake
    below keeps the full Spark plumbing (batch iterator, schema,
    error channel) testable. Detection happens per executor process,
    so the same code self-upgrades wherever Pillow is installed —
    no code change needed outside this sandbox."""

    schema = "doc_id long, width int, height int, ok boolean, err string"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # nullable column: error-channel row
                    rows.append((doc_id, None, None, False, "null payload"))
                    continue
                try:
                    rows.append((doc_id, *_decode(bytes(payload))))
                except NotImplementedError as e:
                    rows.append((doc_id, None, None, False, str(e)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "ok", "err"]
            )

    return media.mapInPandas(decode, schema)


# Frame sampling: the payload as a sequence of fixed-size chunks
# ("frames" — a deterministic stand-in for video frame extraction),
# keeping every EVERY-th chunk. The op's Spark shape is the point:
# a 1->N mapInPandas (output rows exceed input rows), the batch
# geometry real frame sampling has.
FRAME_CHUNK = 64
FRAME_EVERY = 4


def sample_frames(
    media: DataFrame, chunk: int = FRAME_CHUNK, every: int = FRAME_EVERY
) -> DataFrame:
    """Sample every `every`-th fixed-size chunk of each payload as a
    "frame": (doc_id, frame_idx, n_bytes, frame_md5). frame_idx is
    the chunk's ordinal in the full stream (0, every, 2*every, ...),
    so a downstream join can locate the frame in the source.

    Scale: payloads never leave the executors; each Arrow batch of
    payloads explodes to its frames inside the worker. A SAMPLED
    chunk that runs past the end of the stream is truncated (kept
    short), not dropped; chunks between sampled positions — which
    can include the stream's final bytes — are skipped by design,
    that being what sampling means."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, hashes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # nullable: no frames, like empty
                    continue
                b = bytes(payload)
                for i in range(0, len(b), chunk * every):
                    frame = b[i : i + chunk]
                    ids.append(doc_id)
                    idxs.append(i // chunk)
                    sizes.append(len(frame))
                    hashes.append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_md5": pd.Series(hashes, dtype="object"),
                }
            )

    return media.mapInPandas(
        extract, "doc_id long, frame_idx long, n_bytes long, frame_md5 string"
    )


# Resize planning: aspect-preserving downscale to a bounding box.
RESIZE_MAX_SIDE = 256


def resize_plan(
    decoded: DataFrame, max_side: int = RESIZE_MAX_SIDE
) -> DataFrame:
    """Aspect-preserving resize arithmetic over decode_image output:
    images whose longer side exceeds `max_side` scale down to it
    (floor, never upscale); failed decodes pass the error channel
    through untouched. The byte transform itself rides the same
    stubbed decode path — the PLAN (what a resize stage must agree
    on across engines) is exact integer arithmetic, JVM-side."""
    long_side = F.greatest("width", "height")
    scale_num = F.when(long_side > max_side, F.lit(max_side)).otherwise(
        long_side
    )
    out_w = F.floor(F.col("width") * scale_num / long_side).cast("int")
    out_h = F.floor(F.col("height") * scale_num / long_side).cast("int")
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.when(F.col("ok"), out_w).alias("out_width"),
        F.when(F.col("ok"), out_h).alias("out_height"),
        (F.col("ok") & (long_side > max_side)).alias("scaled"),
        "ok",
        "err",
    )


def _image_module():
    """Pillow feature detection (None when absent). Called inside
    the decode UDF so the check runs in the executor's Python
    worker, not just on the driver."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _decode(payload: bytes, image_mod=None):
    """Decode one payload to (width, height, ok, err).

    With Pillow present (or injected via `image_mod` for tests) the
    bytes are really opened; decode failures flow down the error
    channel instead of failing the job. Without it, non-image bytes
    get a deterministic fake (md5-derived dimensions) so the
    pipeline shape stays testable, and real image containers raise
    the honest NotImplementedError."""
    if image_mod is None:
        image_mod = _image_module()
    if image_mod is not None:
        import io

        try:
            with image_mod.open(io.BytesIO(payload)) as im:
                return int(im.width), int(im.height), True, None
        except Exception as e:  # noqa: BLE001 — error-channel row
            return None, None, False, f"decoding failed: {e}"
    if not payload.startswith(b"\x89PNG") and not payload.startswith(
        b"\xff\xd8"
    ):
        # Not a real image container: deterministic fake so the
        # pipeline shape is testable without media libs.
        h = hashlib.md5(payload).digest()
        return (h[0] % 64 + 1) * 16, (h[1] % 64 + 1) * 16, True, None
    raise NotImplementedError(
        "real image decoding requires PIL/libvips — not in this environment"
    )
