"""Seeded throwaway ~sf1 corpus generator for the scaling measurement
(r9 verdict ask 4). NOT part of the contract: it writes a 10×-sf0.1
`documents.parquet` + `embeddings.parquet` with the SAME statistical
profile as the driver's tables (vocabulary reused from the real sf0.1
corpus; 10-100 words/doc uniform; ~0.16% exact duplicates; 20 sources;
the sf0.1 language mix; unit-norm float32 64-dim embeddings with 10
labels) so per-doc/per-vector work matches and wall-time ratios
measure the ENGINE's scaling, not a distribution shift.

Usage: python scripts/gen_scale_corpus.py [out_dir] [scale]
Defaults: /tmp/spark_graft_sf1, 10 (× sf0.1).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 20260815
REF = "/root/testdata/sf0.1"


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    scale = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(SEED)

    ref_docs = pq.read_table(f"{REF}/documents.parquet")
    vocab = sorted(
        {w for t in ref_docs.column("text").to_pylist() for w in t.split(" ")}
    )
    n_docs = len(ref_docs) * scale
    langs = np.array(["en", "zh", "es", "fr", "de"])
    lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])

    lens = rng.integers(10, 101, size=n_docs)
    texts: list[str] = []
    for n in lens:
        texts.append(" ".join(rng.choice(vocab, size=n)))
    # ~0.16% exact duplicates of earlier docs (the sf0.1 rate)
    for i in rng.choice(
        np.arange(1, n_docs), size=max(1, int(n_docs * 0.0016)), replace=False
    ):
        texts[i] = texts[rng.integers(0, i)]
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(rng.choice(langs, size=n_docs, p=lang_p)),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array(
                np.array([len(t) for t in texts]), pa.int64()
            ),
        }
    )
    pq.write_table(docs, f"{out}/documents.parquet")

    ref_emb = pq.read_table(f"{REF}/embeddings.parquet")
    n_vec = len(ref_emb) * scale
    X = rng.standard_normal((n_vec, 64)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    emb = pa.table(
        {
            "vec_id": pa.array(np.arange(n_vec), pa.int64()),
            "embedding": pa.array(list(X), pa.list_(pa.float32())),
            "label": pa.array(
                rng.integers(0, 10, size=n_vec).astype(np.int32), pa.int32()
            ),
        }
    )
    pq.write_table(emb, f"{out}/embeddings.parquet")
    print(f"wrote {n_docs} docs + {n_vec} embeddings to {out}")


if __name__ == "__main__":
    main()
