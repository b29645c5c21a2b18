"""Incremental-recount BPE trainer measurement (r11 verdict ask 4):
demonstrate ≥256 merges on the 10× corpus at a cost far under the
classic trainer's measured 0.25 s/merge job floor, plus the bounded
size of the collected word table (the scale-contract artifact).

Protocol: one JVM; word-table aggregate+collect timed separately from
the pure training loop; training timed at n_merges ∈ {64, 256, 1024};
classic-trainer extrapolation = n_merges × 0.248 s (the r10 measured
per-merge job cost at sf0.1 — job-overhead-bound, so it transfers).
Classic-equality is pinned by tests/test_round12.py, not re-checked
here (256 classic merges would cost ~64 s of jobs by themselves).

FINDING the first run surfaced: the synthetic documents corpus has
only 31 DISTINCT words (2.7M running words at 10×), so its COMPLETE
merge closure is 89 merges — every adjacent pair down to whole words
— which the incremental trainer finishes in ~0.1-0.2 s (the classic
extrapolation for 89 jobs: ~22 s). The ≥256-merge demonstration
therefore also runs on a vocabulary-rich word table (the 31 words'
961 deterministic concatenation pairs, Zipf-ish product frequencies)
— same trainer, same collected-artifact contract, realistic merge
depth.

Usage: python scripts/measure_bpe_incremental.py [corpus ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    corpora = sys.argv[1:] or ["/root/testdata/sf0.1", "/tmp/spark_graft_sf1"]
    from pyspark.sql import functions as F

    from data_framework_spark.functions.bpe import (
        _wrapped_words,
        learn_bpe_merges_incremental,
    )
    from data_framework_spark.session import get_spark
    from data_framework_spark.sources.tables import load_table

    spark = get_spark("bpe-incremental-measurement")
    out: dict = {}
    for corpus in corpora:
        docs = load_table(spark, corpus, "documents")
        t0 = time.perf_counter()
        words = _wrapped_words(docs).persist()
        stats = words.agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.length("w")).alias("chars"),
            F.sum("freq").alias("running"),
        ).collect()[0]
        t_table = time.perf_counter() - t0
        rec = {
            "distinct_words": int(stats["n_words"]),
            "running_words": int(stats["running"]),
            "word_table_mb": round(int(stats["chars"]) / 1e6, 2),
            "t_word_table": round(t_table, 2),
        }
        for n in (64, 256, 1024):
            t0 = time.perf_counter()
            merges = learn_bpe_merges_incremental(docs, n, words=words)
            dt = time.perf_counter() - t0
            rec[f"m{n}"] = {
                "learned": len(merges),
                "t_train": round(dt, 2),
                "merges_per_s": round(len(merges) / dt, 1),
                "classic_extrapolated_s": round(len(merges) * 0.248, 1),
            }
        if corpus == corpora[-1]:
            # vocabulary-rich table derived from the last corpus's own
            # words: all ordered concatenation pairs, freq = product of
            # the parts' corpus frequencies (Zipf-ish), deterministic
            base = [
                (r["word"], int(r["freq"]))
                for r in words.select("word", "freq").collect()
            ]
            from data_framework_spark.functions.bpe import _CS, _OS

            rich = [
                (
                    wa + wb,
                    "".join(f"{_OS}{c}{_CS}" for c in wa + wb),
                    max(1, (fa * fb) % 9973),
                )
                for wa, fa in base
                for wb, fb in base
            ]
            rich_df = spark.createDataFrame(
                rich, "word string, w string, freq long"
            )
            rrec = {
                "distinct_words": len(rich),
                "word_table_kb": round(
                    sum(len(w) for _, w, _ in rich) / 1e3, 1
                ),
            }
            for n in (256, 1024):
                t0 = time.perf_counter()
                merges = learn_bpe_merges_incremental(
                    docs, n, words=rich_df
                )
                dt = time.perf_counter() - t0
                rrec[f"m{n}"] = {
                    "learned": len(merges),
                    "t_train": round(dt, 2),
                    "merges_per_s": round(len(merges) / dt, 1),
                    "classic_extrapolated_s": round(len(merges) * 0.248, 1),
                }
            out["vocab_rich_961"] = rrec
            print(json.dumps({"vocab_rich_961": rrec}), flush=True)
        words.unpersist()
        out[corpus] = rec
        print(json.dumps({corpus: rec}), flush=True)
    print("FINAL", json.dumps(out))


if __name__ == "__main__":
    main()
