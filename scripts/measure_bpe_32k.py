"""Incremental BPE trainer at a production vocabulary (r12 verdict
ask 4): drive `learn_bpe_merges_incremental` to 32k merges — the
production target named in the classic trainer's docstring — on a
WIDE synthetic word table, and record where the pair-index memory
and per-merge time actually land.

Word table: 120k distinct pseudo-random words (deterministic RNG),
lengths 6-14 over a 26-letter alphabet, Zipf frequencies
freq = ceil(3e5 / rank) — ~1.2M symbol positions, a realistic
tokenizer-training artifact shape (HF tokenizers trains on exactly
such a word-frequency table). The table enters through the same
DataFrame surface as the shipped corpora (words=...), so the
collect + training path measured here is the production path.

Reported per checkpoint n_merges ∈ {1k, 4k, 16k, 32k}: total train
wall, marginal merges/s in that bracket, and ru_maxrss growth (the
pair-count dict + pair→words inverted index + the lazy winner heap
are the only growing structures).

Usage: python scripts/measure_bpe_32k.py
"""

from __future__ import annotations

import json
import os
import resource
import string
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def make_word_table(n_words: int = 120_000):
    from data_framework_spark.functions.bpe import _CS, _OS

    rng = np.random.default_rng(20260817)
    letters = np.array(list(string.ascii_lowercase))
    seen = set()
    rows = []
    rank = 0
    while len(rows) < n_words:
        ln = int(rng.integers(6, 15))
        w = "".join(letters[rng.integers(0, 26, ln)])
        if w in seen:
            continue
        seen.add(w)
        rank += 1
        freq = max(1, int(-(-300_000 // rank)))
        rows.append((w, "".join(f"{_OS}{c}{_CS}" for c in w), freq))
    return rows


def main() -> None:
    from data_framework_spark.functions.bpe import (
        learn_bpe_merges_incremental,
    )
    from data_framework_spark.session import get_spark

    spark = get_spark("bpe-32k-measurement")
    rows = make_word_table()
    words = spark.createDataFrame(rows, "word string, w string, freq long")
    out: dict = {
        "distinct_words": len(rows),
        "symbol_positions": int(sum(len(w) for w, _, _ in rows)),
        "word_table_mb": round(sum(len(s) for _, s, _ in rows) / 1e6, 2),
    }
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    prev_n, prev_t = 0, 0.0
    for n in (1024, 4096, 16384, 32768):
        t0 = time.perf_counter()
        merges = learn_bpe_merges_incremental(None, n, words=words)
        dt = time.perf_counter() - t0
        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        out[f"m{n}"] = {
            "learned": len(merges),
            "t_total": round(dt, 2),
            "marginal_merges_per_s": round(
                (len(merges) - prev_n) / max(1e-9, dt - prev_t), 1
            )
            if len(merges) > prev_n
            else 0.0,
            "ru_maxrss_mb": round((rss - rss0) / 1024, 1),
        }
        prev_n, prev_t = len(merges), dt
        print(json.dumps({f"m{n}": out[f"m{n}"]}), flush=True)
    print("FINAL", json.dumps(out))


if __name__ == "__main__":
    main()
