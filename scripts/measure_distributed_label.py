"""Distributed-CCL measurement at an OVERSIZED grid (r11 verdict ask
5): run plans/distributed_label.label_cells on a 4096² grid — 16.8M
cells, 4× past the measured ~4M single-tile applyInPandas ceiling —
and digest-verify the result against driver-side numpy
(kernels.ndimage.label handles 4096² in-process easily; the ceiling
being escaped is per-EXECUTOR-TASK memory, not driver memory, so the
verification is honest).

Mask: hash-field density 58/97 ≈ 0.598 — right at the site-percolation
threshold (~0.593), the adversarial regime for tile stitching: a
near-giant component threads through every tile while a long tail of
small components exercises the rank step. Also runs 1024² (1M cells,
under the ceiling) where the single-tile kernel can run as a direct
wall-clock comparison point.

Digest: per-component (min pid, pixel count) multiset + component
count, computed on both engines. Equality of that multiset + the
label-by-ascending-min-pid construction (unit-pinned at small scale)
implies full label equality without collecting 10M pixel rows.

Usage: python scripts/measure_distributed_label.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from data_framework_spark.kernels.ndimage import label as np_label
    from data_framework_spark.plans.distributed_label import label_cells
    from data_framework_spark.session import get_spark

    spark = get_spark("distributed-label-measurement")
    out: dict = {}
    for side, tile in ((1024, 512), (4096, 1024)):
        cells = (
            spark.range(side * side)
            .select(
                (F.col("id") / side).cast("long").alias("i0"),
                (F.col("id") % side).alias("i1"),
            )
            .filter((F.col("i0") * 7919 + F.col("i1") * 104729) % 97 < 58)
        )
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            label_cells(cells, width=side, tile=tile).write.format(
                "noop"
            ).mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 2))
        # digest: per-component (min pid, count), collected once
        t0 = time.perf_counter()
        digest_rows = (
            label_cells(cells, width=side, tile=tile)
            .groupBy("label")
            .agg(
                F.min(F.col("i0") * side + F.col("i1")).alias("mp"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        t_digest = round(time.perf_counter() - t0, 2)
        got = sorted((int(r["mp"]), int(r["n"])) for r in digest_rows)
        # labels must be 1..n by ascending min pid (the numbering pin)
        by_label = sorted(
            (int(r["label"]), int(r["mp"])) for r in digest_rows
        )
        label_order_ok = all(
            a[1] < b[1] for a, b in zip(by_label, by_label[1:])
        ) and [x[0] for x in by_label] == list(range(1, len(by_label) + 1))
        i0g, i1g = np.meshgrid(
            np.arange(side), np.arange(side), indexing="ij"
        )
        m = ((i0g * 7919 + i1g * 104729) % 97) < 58
        t0 = time.perf_counter()
        lbl, n = np_label(m)
        t_numpy = round(time.perf_counter() - t0, 2)
        pid = (i0g * side + i1g)[m]
        loc = lbl[m]
        mins = np.full(n + 1, np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(mins, loc, pid)
        counts = np.bincount(loc, minlength=n + 1)
        expect = sorted(
            (int(mins[i]), int(counts[i])) for i in range(1, n + 1)
        )
        out[f"{side}x{side}"] = {
            "cells": int(m.sum()),
            "tile": tile,
            "n_components": n,
            "distributed_s": {"cold": times[0], "warm": min(times[1:])},
            "digest_job_s": t_digest,
            "numpy_single_tile_s": t_numpy,
            "digest_match": got == expect,
            "label_order_ok": bool(label_order_ok),
        }
        print(json.dumps({f"{side}x{side}": out[f"{side}x{side}"]}), flush=True)
    print("FINAL", json.dumps(out))


if __name__ == "__main__":
    main()
