"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns plus typed metadata — the schema a
100 TB multimodal corpus actually uses (content-addressed blobs or
inline bytes, one row per asset):

    asset_id long, kind string, payload binary,
    meta struct<width int, height int, sample_rate int, n_frames int>

All Spark-side plumbing (schemas, partitioning, Arrow batch shape,
`mapInPandas` kernel signatures) is real and tested; the actual
codec step is stubbed — the decode libraries (PIL/ffmpeg/etc.) are
not in this container — behind either `NotImplementedError`
(`decode=strict`) or a deterministic fake decoder (`decode=fake`)
so pipelines exercise the full path with reproducible outputs.

Kernel shape: `mapInPandas` (not per-row UDFs) so each task decodes
an Arrow batch of assets at once; metadata-only transforms stay in
column expressions and never touch the payload bytes (column pruning
keeps them off the wire entirely — the win that matters when payload
is KBs-MBs per row).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "asset_id long, kind string, n_bytes long, digest string, feat array<double>"

_FEAT_DIM = 8


def _fake_decode(payload: bytes, dim: int = _FEAT_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed step: md5-seeded
    pseudo-features. STUB — replace with the real codec when the
    image/audio libraries are available."""
    h = hashlib.md5(payload).digest()
    vals = np.frombuffer((h * ((dim * 8) // len(h) + 1))[: dim * 8], dtype="<u8")
    return (vals.astype(np.float64) / np.float64(2**64)) - 0.5


def extract_features(df: DataFrame, decode: str = "fake") -> DataFrame:
    """payload → fixed-dim feature vector via a batched kernel.

    `decode='strict'` raises NotImplementedError inside the kernel —
    the honest production placeholder; `decode='fake'` runs the
    deterministic stand-in end-to-end.
    """
    if decode not in ("fake", "strict"):
        raise ValueError(f"decode must be 'fake' or 'strict', got {decode!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "strict":
                raise NotImplementedError(
                    "real media decode requires codec libraries not present "
                    "in this environment; use decode='fake'"
                )
            feats = [
                _fake_decode(p if p is not None else b"").tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "digest": [
                        hashlib.md5(p if p is not None else b"").hexdigest()
                        for p in pdf["payload"]
                    ],
                    "feat": feats,
                }
            )

    # payload + ids only — metadata never ships to Python
    return df.select("asset_id", "kind", "payload").mapInPandas(
        kernel, schema=FEATURE_SCHEMA
    )


# --- driver-checkable query instantiation ----------------------------------


def q_multimodal_features(spark, sf_dir: str) -> DataFrame:
    """The multimodal pipeline end-to-end on synthesized assets:
    documents become binary payloads (UTF-8 bytes — deterministic, so
    DuckDB rebuilds the identical blobs), kind assigned round-robin,
    then the real `mapInPandas` decode kernel runs per Arrow batch.

    The oracle checks the Python-side byte handling exactly: n_bytes
    and the md5 digest of every payload must match DuckDB's
    octet_length/md5 over the same encoded blobs. The feature vector
    (fake-decode output) is exercised by unit tests instead — its
    numpy bit-twiddling has no SQL equivalent.
    """
    from data_framework_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    feats = extract_features(assets, decode="fake")
    return feats.select("asset_id", "kind", "n_bytes", "digest")


Q_MULTIMODAL_FEATURES_SQL = """
SELECT
  doc_id AS asset_id,
  (['image', 'audio', 'video'])[(doc_id % 3 + 1)::INT] AS kind,
  octet_length(encode(text))::BIGINT AS n_bytes,
  md5(text) AS digest  -- DuckDB md5(VARCHAR) hashes the UTF-8 bytes
FROM documents
WHERE doc_id < 200
"""


def resize_meta(df: DataFrame, max_side: int) -> DataFrame:
    """Metadata-only transform: target dimensions after a bounded
    resize. Pure column expressions — payload untouched/unread."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(
        F.lit(1.0), F.lit(float(max_side)) / F.greatest(w, h).cast("double")
    )
    return df.withColumn(
        "resize_to",
        F.struct(
            F.round(w * scale).cast("int").alias("width"),
            F.round(h * scale).cast("int").alias("height"),
        ),
    )


def frame_sample_plan(df: DataFrame, every_n: int) -> DataFrame:
    """Video frame-sampling plan: explode target frame indices from
    metadata (n_frames) — the shuffle-free prelude to a decode kernel.
    Assets with no decodable frames (n_frames <= 0 or NULL) produce NO
    samples — the old greatest(n-1, 0) fabricated frame index 0 for a
    frame that does not exist, which a decode kernel would read out of
    bounds (round-9 review)."""
    return df.filter(F.col("meta.n_frames") >= 1).select(
        "asset_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
            )
        ).alias("frame_idx"),
    )


def q_multimodal_resize_plan(spark, sf_dir: str) -> DataFrame:
    """The metadata-only resize planner, driver-checked: asset dims
    are synthesized deterministically from doc_id (same arithmetic in
    the oracle), then `resize_meta` computes aspect-preserving bounded
    targets as pure column expressions — the payload column is never
    touched, so at 100 TB this plan reads ONLY the metadata struct."""
    from data_framework_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("kind"),
        F.lit(None).cast("binary").alias("payload"),
        F.struct(
            (320 + (F.col("doc_id") * 7) % 3700).cast("int").alias("width"),
            (200 + (F.col("doc_id") * 13) % 2100).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    out = resize_meta(assets, 1024)
    return out.select(
        "asset_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("resize_to.width").alias("out_width"),
        F.col("resize_to.height").alias("out_height"),
    )


Q_MULTIMODAL_RESIZE_PLAN_SQL = """
WITH assets AS (
  SELECT doc_id AS asset_id,
         (320 + (doc_id * 7) % 3700)::INT  AS width,
         (200 + (doc_id * 13) % 2100)::INT AS height
  FROM documents
),
scaled AS (
  SELECT *, least(1.0, 1024.0 / greatest(width, height)::DOUBLE) AS scale
  FROM assets
)
SELECT asset_id, width, height,
       round(width * scale)::INT  AS out_width,
       round(height * scale)::INT AS out_height
FROM scaled
"""


def q_multimodal_frame_sample(spark, sf_dir: str) -> DataFrame:
    """The video frame-sampling plan, driver-checked: per-video frame
    counts synthesized from doc_id, exploded to one row per sampled
    frame index (stride 4) via `sequence` — the shuffle-free prelude
    that a decode kernel would map over."""
    from data_framework_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 2  # the corpus's "video" assets
    )
    vids = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("kind"),
        F.lit(None).cast("binary").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            ((F.col("doc_id") % 50) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )
    return frame_sample_plan(vids, 4)


Q_MULTIMODAL_FRAME_SAMPLE_SQL = """
SELECT doc_id AS asset_id,
       unnest(range(0, (doc_id % 50) + 1, 4))::INT AS frame_idx
FROM documents
WHERE doc_id % 3 = 2
"""


# --- binary → embedding → retrieval ----------------------------------------


EMBED_DIM = 8
EMBED_QUERIES = 10
EMBED_TOPK = 5


def embed_assets(df: DataFrame) -> DataFrame:
    """payload → EMBED_DIM-dim embedding via the batched encode
    kernel: component j = uint32(md5(md5(payload) ∥ '#j')[:8]) / 2³²
    − 0.5. A deterministic stand-in with the same plumbing as a real
    encoder (Arrow-batched mapInPandas over payload bytes, metadata
    pruned off the wire) whose arithmetic ALSO has an exact DuckDB
    spelling — so unlike the numpy fake-decode features, the entire
    binary→vector→retrieval path is oracle-checkable end-to-end."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for p in pdf["payload"]:
                digest = hashlib.md5(p if p is not None else b"").hexdigest()
                vecs.append(
                    [
                        int(
                            hashlib.md5(f"{digest}#{j}".encode()).hexdigest()[
                                :8
                            ],
                            16,
                        )
                        / 4294967296.0
                        - 0.5
                        for j in range(EMBED_DIM)
                    ]
                )
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "vec": vecs}
            )

    return df.select("asset_id", "payload").mapInPandas(
        kernel, schema="asset_id long, vec array<double>"
    )


def q_multimodal_embed_topk(spark, sf_dir: str) -> DataFrame:
    """The multimodal retrieval pipeline end-to-end: synthesized
    binary assets → Arrow-batched encode kernel → exact cosine top-5
    for the first EMBED_QUERIES assets against the full asset set.
    Unlike q_multimodal_features (whose numpy features are unit-tested
    only), the embedding here is md5-derived so DuckDB recomputes the
    identical vectors and the WHOLE binary→vector→top-k path is in
    the hash: a kernel bug, an Arrow truncation, or a broken cosine
    all show up as a digest mismatch."""
    from data_framework_spark.similarity.ann import brute_force_topk
    from data_framework_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    emb = embed_assets(assets)
    queries = emb.filter(F.col("asset_id") < EMBED_QUERIES)
    return (
        brute_force_topk(emb, queries, "asset_id", "vec", k=EMBED_TOPK)
        .orderBy("query_id", "rank")
    )


def _embed_sql() -> str:
    comps = ", ".join(
        "(('0x' || substring(md5(md5(text) || '#%d'), 1, 8))::UBIGINT::DOUBLE"
        " / 4294967296.0 - 0.5)" % j
        for j in range(EMBED_DIM)
    )
    return f"""
WITH emb AS (
  SELECT doc_id AS asset_id, [{comps}] AS vec
  FROM documents WHERE doc_id < 200
),
n AS (
  SELECT asset_id, vec,
         sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
  FROM emb
),
scored AS (
  SELECT q.asset_id AS query_id, c.asset_id AS neighbor_id,
         round(
           list_sum(list_transform(range(1, {EMBED_DIM} + 1),
                                   i -> q.vec[i] * c.vec[i]))
           / (q.nrm * c.nrm), 6) AS cos
  FROM n q, n c
  WHERE q.asset_id < {EMBED_QUERIES} AND q.asset_id <> c.asset_id
)
SELECT query_id, neighbor_id, cos, rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
  FROM scored
)
WHERE rank <= {EMBED_TOPK}
ORDER BY query_id, rank
"""


Q_MULTIMODAL_EMBED_TOPK_SQL = _embed_sql()
