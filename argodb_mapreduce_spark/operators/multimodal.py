"""Multimodal column operators (SURVEY.md §2.C5).

Media (image/audio/video) is modeled as opaque ``binary`` columns with
typed metadata — the Spark-native layout for a multimodal training-data
lake. The decode/feature paths run as Arrow-batched ``mapInPandas``
pipelines (the real plumbing: schema, batch iteration, partition
parallelism), with the *decoder itself* stubbed deterministically —
the container has no image/audio libs, so ``decode_image``/
``decode_audio`` raise NotImplementedError behind an import-try, and
the registered queries use deterministic byte-level feature extractors
whose results are SQL-expressible, keeping even the Pandas-UDF path
DuckDB-oracle-checked (fixture text is ASCII, so byte ops == char ops).

At 100 TB: mapInPandas streams Arrow batches executor-side — no
driver involvement, no shuffle; per-file parallelism comes from the
scan. This is the correct shape for media feature extraction at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argodb_mapreduce_spark.catalog import load_table
from argodb_mapreduce_spark.registry import register

FRAME_BYTES = 64
FRAME_STRIDE = 4  # sample every 4th frame


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, content binary, meta struct) media table."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.length(F.encode("text", "utf-8")).alias("byte_len"),
            F.lit("text/plain").alias("mime"),
            F.col("lang").alias("lang"),
        ).alias("meta"),
    )


# -- stubbed real decoders (no media libs in this container) ---------------

try:  # pragma: no cover - PIL is absent in the v1 image
    from PIL import Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def decode_image(df: DataFrame, content_col: str = "content") -> DataFrame:
    """STUB: real image decode (resize / pixel stats) requires PIL.

    The Spark-side contract (binary in, struct of features out via
    mapInPandas) is what production code would keep; only the inner
    ``Image.open`` call is missing in this environment.
    """
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL, which is not available in this "
            "environment; use multimodal_byte_features for the plumbing-"
            "equivalent deterministic path"
        )
    raise NotImplementedError("real decoder intentionally not implemented in v1")


@register(
    "multimodal_ingest",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS byte_len,
           'text/plain' AS mime,
           ascii(substring(text, 1, 1)) AS first_byte
    FROM documents
    """,
    tags=("multimodal",),
    doc="Binary-column ingest: encode to binary + typed metadata struct; projected back out for the oracle.",
)
def multimodal_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("meta.byte_len").cast("long").alias("byte_len"),
        F.col("meta.mime").alias("mime"),
        F.ascii(F.decode(F.substring("content", 1, 1), "utf-8")).alias("first_byte"),
    )


# NB: the mapInPandas callables below are defined as NESTED functions
# inside each query so cloudpickle serializes them by value — Spark's
# Python workers do not have this repo on their import path, so a
# module-level function (pickled by reference) would fail to unpickle.

_FEATURE_SCHEMA = "doc_id long, byte_len long, n_space long, checksum long"


@register(
    "multimodal_byte_features",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS byte_len,
           LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS n_space,
           CAST((SELECT SUM(ascii(substring(text, i, 1))) % 65536
            FROM UNNEST(range(1, LENGTH(text) + 1)) AS u(i)) AS BIGINT) AS checksum
    FROM documents
    """,
    tags=("multimodal", "pandas-udf"),
    doc=(
        "Arrow-batched mapInPandas feature extraction over a binary "
        "column — the real multimodal decode plumbing with a "
        "deterministic byte-level stand-in for the decoder, so the "
        "Pandas-UDF path itself is oracle-checked."
    ),
)
def multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir).select("doc_id", "content")

    def run(batches):  # nested → pickled by value, import-path independent
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(b) for b in pdf["content"]],
                    "n_space": [bytes(b).count(b" ") for b in pdf["content"]],
                    "checksum": [sum(bytes(b)) % 65536 for b in pdf["content"]],
                }
            )

    return m.mapInPandas(run, schema=_FEATURE_SCHEMA)


_FRAME_SCHEMA = "doc_id long, frame_no int, frame_md5 string"


@register(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(fno AS INT) AS frame_no,
           md5(substring(text, fno * {FRAME_BYTES} + 1, {FRAME_BYTES})) AS frame_md5
    FROM documents,
         UNNEST(range(0, LENGTH(text) // {FRAME_BYTES}, {FRAME_STRIDE})) AS u(fno)
    """,
    tags=("multimodal", "pandas-udf"),
    doc=(
        f"Strided frame sampling over opaque media bytes ({FRAME_BYTES}-byte "
        f"frames, every {FRAME_STRIDE}th): 1→N mapInPandas batch transform, "
        "md5 fingerprint per sampled frame, oracle-checked byte-for-byte."
    ),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_table(spark, sf_dir).select("doc_id", "content")
    frame_bytes, frame_stride = FRAME_BYTES, FRAME_STRIDE

    def run(batches):  # fake video frame sampler; md5 == Spark md5 == DuckDB md5
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, frame_nos, hashes = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["content"]):
                data = bytes(blob)
                for fno in range(0, len(data) // frame_bytes, frame_stride):
                    ids.append(doc_id)
                    frame_nos.append(fno)
                    hashes.append(hashlib.md5(data[fno * frame_bytes : (fno + 1) * frame_bytes]).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_no": frame_nos, "frame_md5": hashes})

    return m.mapInPandas(run, schema=_FRAME_SCHEMA)
