"""SparkVariable — one physical quantity on a (time × space) grid.

Re-expresses the reference's `Variable`/`StatMeshVar`
(src/variables/variable.py:6-93, src/variables/statmeshvar.py:13-200)
over a long-format DataFrame: one row per grid cell,

    t double, i0..i{d-1} long, c0..c{d-1} double, value double

(SURVEY.md §1.3). Index columns carry grid topology (stencils,
interpolation cells); coordinate columns carry physical positions.
The reference's dense ndarray + deepcopy-per-slice
(variable.py:69) becomes an immutable lazy plan — each slice is a
`.filter`/transform on the parent plan, materialized only on action.

Slice semantics preserved exactly (SURVEY.md §2.2):
- `ndslice` applies `_timeslice` → `_zoom` → `_spaceslice` in that
  fixed order, each only when its argument is present
  (variable.py:73-78);
- `_timeslice` is inclusive both ends (statmeshvar.py:95-100);
- `_zoom` sorts each bounds pair and treats ±inf as unbounded
  (statmeshvar.py:102-109);
- `_spaceslice` is the interpolating line slice (statmeshvar.py:
  111-200), implemented in operators/interpolate.py as a weighted
  join.

The mesh / timeseries coordinate arrays are cached driver-side
(small: one float per grid line, not per cell) because slice
*planning* needs them — grid spacing, bounds clipping — exactly the
arithmetic the reference does on its mesh attributes.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_framework_spark.operators.slicing import timeslice as _timeslice_op
from data_framework_spark.operators.slicing import zoom as _zoom_op


class SparkVariable:
    """Static-mesh variable (the reference's only functional type,
    statmeshvar.py:13-33)."""

    def __init__(
        self,
        label: str,
        df: DataFrame,
        ndim: int,
        timeseries: np.ndarray | None = None,
        mesh: list[np.ndarray] | None = None,
    ):
        self.label = label
        self.df = df
        self.ndim = ndim
        self._timeseries = timeseries
        self._mesh = mesh

    # -- cached coordinate arrays ------------------------------------------

    @property
    def timeseries(self) -> np.ndarray:
        if self._timeseries is None:
            rows = self.df.select("t").distinct().orderBy("t").collect()
            self._timeseries = np.array([r[0] for r in rows])
        return self._timeseries

    @property
    def mesh(self) -> list[np.ndarray]:
        if self._mesh is None:
            out = []
            for d in range(self.ndim):
                rows = (
                    self.df.select(f"i{d}", f"c{d}")
                    .distinct()
                    .orderBy(f"i{d}")
                    .collect()
                )
                out.append(np.array([r[1] for r in rows]))
            self._mesh = out
        return self._mesh

    def _with(self, df: DataFrame, timeseries=None, mesh=None) -> "SparkVariable":
        return SparkVariable(self.label, df, self.ndim, timeseries, mesh)

    # -- reference surface --------------------------------------------------

    def ndslice(
        self,
        timelims: Sequence | None = None,
        zooms: Sequence[Sequence[float]] | None = None,
        set_pts: Sequence[Sequence[float]] | None = None,
        interp: str = "linear",
        **kwargs,
    ) -> "SparkVariable":
        """Fixed-order slice dispatch (variable.py:73-78)."""
        out = self
        if timelims is not None:
            out = out._timeslice(timelims)
        if zooms is not None:
            out = out._zoom(zooms)
        if set_pts is not None:
            # per-variable interp override: '<label>interp' kwarg
            # (statmeshvar.py:121-126)
            method = kwargs.get(f"{self.label}interp", interp)
            out = out._spaceslice(set_pts, method)
        return out

    def _timeslice(self, timelims: Sequence) -> "SparkVariable":
        df = _timeslice_op(self.df, "t", timelims)
        ts = None
        if self._timeseries is not None:
            lo, hi = timelims
            ts = self._timeseries[
                (self._timeseries >= lo) & (self._timeseries <= hi)
            ]
        return self._with(df, timeseries=ts, mesh=self._mesh)

    def _zoom(self, zooms: Sequence[Sequence[float]]) -> "SparkVariable":
        if len(zooms) != self.ndim:
            raise ValueError(
                f"zooms must give one (lo, hi) pair per spatial dim: "
                f"got {len(zooms)} for {self.ndim}-D variable {self.label!r}"
            )
        df = _zoom_op(self.df, [f"c{d}" for d in range(self.ndim)], zooms)
        mesh = None
        if self._mesh is not None:
            mesh = []
            for d, pair in enumerate(zooms):
                lo, hi = sorted(pair)
                m = self._mesh[d]
                mesh.append(m[(m >= lo) & (m <= hi)])
        return self._with(df, timeseries=self._timeseries, mesh=mesh)

    def _spaceslice(self, set_pts, interp: str = "linear") -> "SparkVariable":
        from data_framework_spark.operators.interpolate import line_slice

        return line_slice(self, set_pts, interp)

    def bounds(self, time: bool = True, space: bool = True) -> list[list[float]]:
        """[min, max] of timeseries then each mesh dim, time first
        (statmeshvar.py:35-59).

        When the coordinate arrays are already cached driver-side they
        answer directly; otherwise this runs ONE min/max aggregate over
        the plan — never the distinct-collect the timeseries/mesh
        properties do (an extremum over 100 TB is an aggregate, not a
        driver-side array build)."""
        # cached path: only the REQUESTED coordinate arrays need to be
        # cached (round-9 review: requiring _timeseries even for
        # time=False forced a cluster aggregate although every needed
        # value was already in _mesh)
        t_ok = not time or self._timeseries is not None
        s_ok = not space or self._mesh is not None
        if t_ok and s_ok:
            out = []
            if time:
                ts = self._timeseries
                if len(ts) == 0:
                    raise ValueError(
                        f"variable {self.label!r} has an empty timeseries"
                        " — no time bounds exist"
                    )
                out.append([float(ts.min()), float(ts.max())])
            if space:
                for d, m in enumerate(self._mesh):
                    if len(m) == 0:
                        raise ValueError(
                            f"variable {self.label!r} mesh dim {d} is empty"
                            " (zoomed to nothing?) — no bounds exist"
                        )
                    out.append([float(m.min()), float(m.max())])
            return out
        aggs = []
        if time:
            aggs += [F.min("t"), F.max("t")]
        if space:
            for d in range(self.ndim):
                aggs += [F.min(f"c{d}"), F.max(f"c{d}")]
        row = self.df.agg(*aggs).first()
        return [
            [float(row[i]), float(row[i + 1])] for i in range(0, len(row), 2)
        ]

    # -- construction helpers ----------------------------------------------

    @classmethod
    def from_numpy(
        cls,
        spark,
        label: str,
        timeseries: np.ndarray,
        mesh: list[np.ndarray],
        data: np.ndarray,
    ) -> "SparkVariable":
        """Build the long-format DataFrame from a dense `data[t, d0, d1,
        ...]` array (the reference's storage layout, statmeshvar.py:
        23-27). Test/ingestion path — production data arrives as
        parquet already in long format."""
        import pandas as pd

        if data.shape[0] != len(timeseries):
            raise ValueError("data.shape[0] must equal len(timeseries)")
        if tuple(data.shape[1:]) != tuple(len(m) for m in mesh):
            raise ValueError("data spatial shape must match mesh lengths")
        ndim = len(mesh)
        idx = np.indices(data.shape).reshape(data.ndim, -1)
        cols = {"t": np.asarray(timeseries, dtype=float)[idx[0]]}
        for d in range(ndim):
            cols[f"i{d}"] = idx[d + 1].astype(np.int64)
            cols[f"c{d}"] = np.asarray(mesh[d], dtype=float)[idx[d + 1]]
        cols["value"] = data.reshape(-1).astype(float)
        pdf = pd.DataFrame(cols)
        df = spark.createDataFrame(pdf)
        return cls(
            label,
            df,
            ndim,
            np.asarray(timeseries, dtype=float),
            [np.asarray(m, dtype=float) for m in mesh],
        )

    def to_numpy(self) -> np.ndarray:
        """Densify back to `data[t, d0, ...]` (differential tests)."""
        ts = self.timeseries
        mesh = self.mesh
        shape = (len(ts),) + tuple(len(m) for m in mesh)
        t_pos = {v: i for i, v in enumerate(ts)}
        out = np.full(shape, np.nan)
        idx_cols = [f"i{d}" for d in range(self.ndim)]
        # re-rank indices in case slicing removed leading cells
        rows = self.df.select("t", *idx_cols, "value").collect()
        ranks = []
        for d in range(self.ndim):
            uniq = sorted({r[1 + d] for r in rows})
            ranks.append({v: i for i, v in enumerate(uniq)})
        for r in rows:
            pos = (t_pos[r[0]],) + tuple(
                ranks[d][r[1 + d]] for d in range(self.ndim)
            )
            out[pos] = r[-1]
        return out


def dyn_mesh_var(*_args, **_kwargs):
    """Time-varying-mesh variable: not implemented, matching the
    reference's behavior exactly (src/variables/dynmeshvar.py:26
    raises on construction)."""
    raise ValueError("DynMeshVar (time-varying mesh) is not implemented yet")
