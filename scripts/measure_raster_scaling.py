"""Raster/structures scaling measurement (r10 verdict ask 5): the
reference-surface flagships scale by TIMESTEP COUNT and TILE SIZE, not
corpus rows, so the LLM-ops 10× table says nothing about them. This
script measures the halo-exchange tiled Gaussian (the
halo_smooth_multi_t shape: σ=1, radius-4, 256×256 patches) at:

- base:       8 t × (1056 × 1000)  — the registry query's own shape
- t8x:       64 t × (1056 × 1000)  — 8× more timesteps (expect ~linear:
              per-t work is independent; 64 t × 20 patches = 1280 tasks)
- grid4x:     8 t × (2112 × 2000)  — 4× cells per timestep through the
              SAME 256×256 patches (expect ~linear in cells: patch
              count grows 4×, per-patch work constant)
- single4x:   8 t × (2112 × 2000) through the NON-halo single-tile
              runner (tile_apply: one pandas group per timestep) — the
              path whose per-task memory grows with the grid; its
              wall-vs-halo gap and the group-size arithmetic locate
              the tile-memory ceiling
- single16x:  2 t × (4224 × 4000) single-tile — 16.9M cells/group,
              ~0.8 GB of pandas per group: approaching the per-group
              Arrow/pandas practical ceiling this measurement is for

The synthetic field is the registry query's own formula, regenerated
here with parameterized dimensions so the production module stays
byte-identical. Cold = first run, warm = min of 2 repeats.

Usage: python scripts/measure_raster_scaling.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def field(spark: SparkSession, n_t: int, n0: int, n1: int) -> DataFrame:
    """The q_halo_smooth_multi_t synthetic field with free dims."""
    return (
        spark.range(n_t * n0 * n1)
        .select(
            (F.col("id") / (n0 * n1)).cast("long").cast("double").alias("t"),
            ((F.col("id") % (n0 * n1)) / n1).cast("long").alias("i0"),
            (F.col("id") % n1).alias("i1"),
        )
        .withColumn("c0", F.lit(-8.0) + F.col("i0") * F.lit(16.0 / (n0 - 1)))
        .withColumn("c1", F.col("i1") * F.lit(0.01))
        .withColumn(
            "value",
            F.sin(F.col("c0")) * F.cos(F.col("c1"))
            + F.sin(F.lit(0.35) * F.col("t")),
        )
    )


def main() -> None:
    from data_framework_spark.kernels import ndimage
    from data_framework_spark.plans.tile_kernel import tile_apply, tile_apply_halo
    from data_framework_spark.session import get_spark

    spark = get_spark("raster-scaling")
    kern = lambda a: ndimage.gaussian_filter(a, (1.0, 1.0))  # noqa: E731

    cases = {
        "base": ("halo", 8, 1056, 1000),
        "t8x": ("halo", 64, 1056, 1000),
        "grid4x": ("halo", 8, 2112, 2000),
        "single4x": ("single", 8, 2112, 2000),
        "single16x": ("single", 2, 4224, 4000),
    }
    out: dict[str, dict] = {}
    for name, (mode, nt, n0, n1) in cases.items():
        times = []
        for _ in range(3):
            f = field(spark, nt, n0, n1)
            run = (
                tile_apply_halo(f, kern, radius=4, tile=256)
                if mode == "halo"
                else tile_apply(f, kern)
            )
            t0 = time.perf_counter()
            run.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        cells = nt * n0 * n1
        out[name] = {
            "mode": mode,
            "nt": nt,
            "grid": f"{n0}x{n1}",
            "mcells": round(cells / 1e6, 1),
            "cells_per_group_m": round(
                (n0 * n1 if mode == "single" else (256 + 8) * (256 + 8)) / 1e6, 3
            ),
            "cold": times[0],
            "warm": min(times[1:]),
        }
    base_w = out["base"]["warm"]
    base_c = out["base"]["mcells"]
    for name, rec in out.items():
        rec["warm_ratio_vs_base"] = round(rec["warm"] / base_w, 2)
        rec["cells_ratio_vs_base"] = round(rec["mcells"] / base_c, 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
