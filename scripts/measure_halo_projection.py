"""r18: settle the halo_smooth_multi_t question (VERDICT item 3).

Interleaved same-session A/B of the r17 projected input
(t, i0, i1, value) vs the pre-r17 full-column input (… + c0, c1)
through tile_apply_halo + the per-t summary, min/median of N reps.
The projection is strictly narrowing, so the r17 'regression' should
be noise (warm spread was 20.4 s in the builder's run); this measures
it on whatever climate the box has now.

Usage: python scripts/measure_halo_projection.py [reps]
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    from pyspark.sql import functions as F

    from data_framework_spark.kernels import ndimage
    from data_framework_spark.operators.raster_queries import _halo_mt_field
    from data_framework_spark.plans.tile_kernel import tile_apply_halo
    from data_framework_spark.session import get_spark

    spark = get_spark("measure_halo_projection")
    spark.range(10).count()  # warm

    def run(projected: bool) -> float:
        field = _halo_mt_field(spark)
        if projected:
            field = field.select("t", "i0", "i1", "value")
        out = tile_apply_halo(
            field,
            lambda a: ndimage.gaussian_filter(a, (1.0, 1.0)),
            radius=4,
            tile=256,
        )
        summary = (
            out.groupBy("t")
            .agg(
                F.count(F.lit(1)).alias("n_cells"),
                F.round(F.sum(F.abs(F.col("value"))), 2).alias("checksum"),
            )
            .orderBy("t")
        )
        t0 = time.perf_counter()
        summary.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run(True)  # warm both plan shapes once
    run(False)
    res: dict[str, list[float]] = {"projected": [], "full": []}
    for _ in range(reps):
        res["projected"].append(run(True))
        res["full"].append(run(False))
    for k, v in res.items():
        print(f"{k}: min={min(v):.3f} med={sorted(v)[len(v)//2]:.3f} "
              f"all={[round(x, 3) for x in v]}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
