"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio libraries, so the *decode* step is
stubbed: ``extract_features`` computes deterministic pseudo-features from
the raw bytes (header fields + checksums), and ``decode_image`` raises
NotImplementedError unless Pillow is importable.  Everything Spark-side —
schema, binary handling, partitioning, UDF signature, Arrow batch shape —
is real and tested; swapping the stub for a real decoder changes only the
function body.

Scale notes: payloads stay in executor memory one Arrow batch at a time
(mapInPandas is an iterator — no whole-partition materialization);
feature extraction is embarrassingly parallel with zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "asset_id long, modality string, byte_len long, header_magic string, "
    "fake_width long, fake_height long, checksum string"
)


def synth_assets(docs: DataFrame) -> DataFrame:
    """Deterministic fake binary corpus from the documents fixture:
    payload = utf-8 text bytes behind a tiny fake header; modality cycles
    image/audio/video."""
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    header = F.unhex(F.concat(F.lit("FEED"), F.lpad(F.hex(F.col("doc_id") % 256), 4, "0")))
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.concat(header, F.encode("text", "UTF-8")).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _byte_at(col, i: int):
    """i-th byte (1-based) of a binary column as a long — substring works
    on BinaryType, hex→conv turns the single byte into its integer value."""
    return F.conv(F.hex(F.substring(col, i, 1)), 16, 10).cast("long")


def extract_features(assets: DataFrame) -> DataFrame:
    """Byte-level feature extraction over binary payloads as NATIVE column
    expressions — length, header slicing, and checksums never leave the
    JVM (whole-stage codegen, zero Python).  Only work a real decoder
    genuinely needs Python for belongs in ``decode_features`` below."""
    p = F.col("payload")
    return assets.select(
        "asset_id",
        "modality",
        F.length(p).cast("long").alias("byte_len"),
        F.lower(F.hex(F.substring(p, 1, 2))).alias("header_magic"),
        # deterministic stand-ins for decoded dimensions (header bytes 3/4)
        (16 * (1 + _byte_at(p, 3) % 64)).cast("long").alias("fake_width"),
        (16 * (1 + _byte_at(p, 4) % 64)).cast("long").alias("fake_height"),
        # checksum over the lowercase hex encoding (not raw bytes): byte-
        # deterministic AND expressible in engines whose sha256 only
        # accepts strings — keeps the oracle portable
        F.sha2(F.lower(F.hex(p)), 256).alias("checksum"),
    )


def decode_features(assets: DataFrame) -> DataFrame:
    """The DECODER SEAM: Arrow-batched mapInPandas over binary payloads —
    the place a real Pillow/ffmpeg decode plugs in (payloads stream one
    Arrow batch at a time; zero shuffle).  With no decoder libraries in
    this container it emits the same deterministic pseudo-features as
    ``extract_features``; pytest pins the two paths equal, so swapping in
    a real decoder body is the only change a production deploy makes."""
    import hashlib

    import pandas as pd

    def _null_ok(fn):
        # NULL payload → NULL features, matching the JVM twin (F.length
        # etc. are null-propagating); one bad row must not fail the
        # whole Arrow batch (round-6 advice, low).  Short payloads are
        # handled inside the per-column lambdas the same way substring
        # handles them JVM-side: a missing header byte is NULL, not an
        # IndexError that kills the batch (round-7 review).
        def guarded(b):
            if b is None or (isinstance(b, float) and pd.isna(b)):
                return None
            return fn(b)

        return guarded

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "byte_len": payloads.map(_null_ok(len)).astype("Int64"),
                    "header_magic": payloads.map(_null_ok(lambda b: bytes(b[:2]).hex())),
                    "fake_width": payloads.map(
                        _null_ok(lambda b: 16 * (1 + b[2] % 64) if len(b) > 2 else None)
                    ).astype("Int64"),
                    "fake_height": payloads.map(
                        _null_ok(lambda b: 16 * (1 + b[3] % 64) if len(b) > 3 else None)
                    ).astype("Int64"),
                    "checksum": payloads.map(
                        _null_ok(
                            lambda b: hashlib.sha256(bytes(b).hex().encode()).hexdigest()
                        )
                    ),
                }
            )

    return assets.mapInPandas(features, schema=FEATURE_SCHEMA)


def decode_image(payload: bytes):
    """Real decode — gated on Pillow availability (absent in this
    container by design)."""
    try:
        from io import BytesIO

        from PIL import Image  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires Pillow, which is not installed; "
            "extract_features provides the stubbed pipeline"
        ) from e
    return Image.open(BytesIO(payload))  # pragma: no cover


def frame_sample_stub(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (asset_id, frame_no) rows for
    a deterministic fake frame count derived from payload length — the
    explode pattern a real decoder would feed."""
    n_frames = (F.length("payload") / 100).cast("long") + 1
    return assets.where(F.col("modality") == "video").select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_no"),
    )


RESIZE_SCHEMA = "asset_id long, width int, height int, thumb binary"


def resize_stub(assets: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image-resize seam: Arrow-batched mapInPandas emitting fixed-size
    thumbnails — the same contract a Pillow ``Image.resize`` body would
    satisfy (binary in → binary of exactly width·height bytes out, one
    Arrow batch at a time, zero shuffle).  The stub derives the thumb
    deterministically (sha256 of the payload, cycled to length), so
    tests can pin byte-exact outputs; a production deploy swaps ONLY the
    body.  Images only — other modalities pass through untouched
    upstream."""
    import hashlib

    import pandas as pd

    n = width * height

    def thumbs(batches):
        for pdf in batches:
            payloads = pdf["payload"]

            def make(b):
                # NULL payload → NULL thumb, matching the binary-in
                # contract a real Pillow body needs too: one bad row must
                # not fail the whole Arrow batch (round-6 advice, low).
                if b is None or (isinstance(b, float) and pd.isna(b)):
                    return None
                digest = hashlib.sha256(bytes(b)).digest()
                reps = -(-n // len(digest))
                return (digest * reps)[:n]

            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "thumb": payloads.map(make),
                }
            )

    return assets.where(F.col("modality") == "image").mapInPandas(
        thumbs, schema=RESIZE_SCHEMA
    )


def media_dedup_exact(assets: DataFrame, header_len: int = 4) -> DataFrame:
    """Container-metadata-insensitive exact dedup over binary payloads:
    hash the codec BODY (payload minus the ``header_len``-byte wrapper),
    not the whole file — the media analogue of text dedup's
    normalize-then-hash, and the reason re-wrapped copies (new EXIF, new
    container mux, here the per-asset fake header) still collapse.

    Output: (content_hash, keeper_id, n_copies) — one row per distinct
    body, keeper = min asset id (deterministic).  Entirely JVM-side
    (substring/hex/sha2 on BinaryType — no Python, no decode), one
    shuffle on the uniform content hash; the same shape as
    dedup.exact_dedup so the curation machinery (clusters, keepers,
    ledgers) composes unchanged."""
    body = F.expr(f"substring(payload, {header_len + 1}, length(payload))")
    h = F.sha2(F.lower(F.hex(body)), 256)
    return (
        assets.select(F.col("asset_id"), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("asset_id").alias("keeper_id"),
            F.count("*").alias("n_copies"),
        )
    )
