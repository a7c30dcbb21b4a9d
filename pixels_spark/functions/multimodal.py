"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``BinaryType`` columns + a typed metadata struct —
the same modeling the reference applies to VARBINARY
(``pixels-core/.../vector/BinaryColumnVector.java``), extended with the
Arrow-batched decode/feature-extraction pattern an LLM data pipeline needs.

The actual decoders (PIL/ffmpeg/torchaudio) are NOT installed in this
environment, so ``decode_image``/``decode_audio`` raise NotImplementedError
behind a clearly-marked seam, and ``fake_feature_extractor`` provides a
deterministic stand-in so the Spark-side plumbing — schema, batch iteration,
partition-parallel mapInPandas, feature schema — is real and tested.

Scale notes: mapInPandas streams Arrow batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``) so executor memory is
O(batch), not O(partition); media bytes never hit the driver. Partition by
content-defined key (e.g. hash(uri) % N) on write so decode work spreads
evenly regardless of per-file media size skew.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

# media row: opaque payload + typed metadata (mime, width/height or
# sample-rate live inside `meta` as JSON to stay schema-stable across kinds)
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("meta", StringType()),  # JSON: {"mime": ..., "w": ..., ...}
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
        StructField("feat_mean", DoubleType()),
    ]
)


def decode_image(payload: bytes) -> object:
    """STUB: real impl would be PIL.Image.open(io.BytesIO(payload)).
    Image libraries are not available in this environment."""
    raise NotImplementedError("image decoding requires PIL/opencv — not installed")


def decode_audio(payload: bytes) -> object:
    """STUB: real impl would be torchaudio/librosa load."""
    raise NotImplementedError("audio decoding requires torchaudio — not installed")


def fake_feature_extractor(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for decode→featurize: (n_bytes, checksum,
    mean byte value). Same signature/shape a real extractor would return."""
    n = len(payload)
    checksum = sum(payload) % (1 << 31)
    return n, checksum, (checksum / n if n else 0.0)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over a MEDIA_SCHEMA DataFrame.

    Uses mapInPandas (not a row UDF): payloads arrive as Arrow binary
    batches, the extractor runs per batch, and output is a new typed
    DataFrame — the canonical Spark shape for media pipelines.
    """

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats = [fake_feature_extractor(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [f[0] for f in feats],
                    "checksum": [f[1] for f in feats],
                    "feat_mean": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


DECODERS = {
    "image": decode_image,
    "audio": decode_audio,
}


def decode(kind: str, payload: bytes) -> object:
    """Kind-dispatched decode seam. Real deployments register decoders in
    DECODERS; this environment's stubs raise NotImplementedError, which is
    the documented contract for missing media libraries."""
    try:
        decoder = DECODERS[kind]
    except KeyError:
        raise ValueError(f"no decoder registered for media kind {kind!r}") from None
    return decoder(payload)


def documents_as_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Adapter producing a MEDIA_SCHEMA DataFrame from the documents fixture
    (text bytes as payload) so the pipeline is exercisable without real
    media fixtures. ``kind`` assigns image/audio/video round-robin when set
    to 'mixed'."""
    if kind == "mixed":
        kind_col = F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        )
    else:
        kind_col = F.lit(kind)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind_col.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.to_json(F.struct(F.lit("text/plain").alias("mime"))).alias("meta"),
    )
