"""Array-source ingestion — the VPIC file-scan stand-in (SURVEY.md §2.1).

Re-expresses `VPICDataset._init_vpicfile`
(/root/reference/src/datasets/vpicdataset.py:142-230) against a small
reader protocol instead of `pyvpic.open` (pyvpic/h5py are not in this
environment). Reproduced semantics, cited line-by-line:

- timeseries/default mesh from the FIRST dataset's grid (:197-198);
- degenerate-dimension squeeze: default mesh keeps only axes with
  more than one grid line; dropped axes are remembered as
  `empty_dims` (:199-204), and each variable's data is `np.squeeze`d
  (:229);
- `get_vars` selection: case-sensitive substring match where each
  requested pattern takes only the FIRST matching dataset name then
  breaks (:206-213) — the reference's documented edge-case behavior,
  kept bug-for-bug;
- per-variable mesh: shares the dataset default when the grids match,
  otherwise keeps the variable's own non-degenerate axes (:219-228);
- variable labels are the last '/'-component of the dataset path
  (:216).

`read_params` implements the reference's own `_get_params` TODO
(vpicdataset.py:232-245 just prints an apology): a `key value` text
format with optional `paramlist` selection, numbers auto-coerced.

Scale posture: the protocol below hands over dense per-variable
arrays, so ingestion necessarily passes through the driver — it is
the TEST/small-file path, exactly like `SparkVariable.from_numpy`
(variable.py). Production data at 100 TB lands as long-format parquet
(one directory per variable, partitioned by t) and is loaded with
`SparkDataset.restore` / `spark.read.parquet`, never through this
module; the long-format schema produced here is identical to that
path, which is the point — everything downstream is
ingestion-agnostic.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from pyspark.sql import DataFrame, SparkSession

from data_framework_spark.dataset import SparkDataset
from data_framework_spark.variable import SparkVariable

try:  # pragma: no cover - not installed in this environment
    import pyvpic  # noqa: F401

    HAVE_PYVPIC = True
except ImportError:
    HAVE_PYVPIC = False


class DictArraySource:
    """In-memory reader implementing the pyvpic-shaped protocol:
    `.datasets`, `.get_grid(name)` → (t, *axes), `source[name]` →
    dense data array of shape (len(t), *axis lengths).

    A real VPIC adapter would wrap `pyvpic.open(...)` with the same
    three members (reader.datasets / reader.get_grid / reader[name],
    vpicdataset.py:194-229); gate it behind HAVE_PYVPIC.
    """

    def __init__(
        self,
        arrays: dict[str, np.ndarray],
        grids: dict[str, tuple[np.ndarray, ...]],
    ):
        self.datasets = list(arrays)
        self._arrays = arrays
        self._grids = grids

    def get_grid(self, name: str) -> tuple[np.ndarray, ...]:
        return self._grids[name]

    def __getitem__(self, name: str) -> np.ndarray:
        return self._arrays[name]


def select_vars(names: Sequence[str], get_vars: Sequence[str] | None) -> list[str]:
    """The reference's get_vars filter: substring, case-sensitive,
    first match per pattern then break (vpicdataset.py:206-213)."""
    if get_vars is None or (len(get_vars) > 0 and get_vars[0] == "all"):
        return list(names)
    out: list[str] = []
    for pat in get_vars:
        for name in names:
            if pat in name:
                out.append(name)
                break
    return out


def ingest_arrays(
    spark: SparkSession,
    source,
    get_vars: Sequence[str] | None = None,
    params: dict | None = None,
) -> SparkDataset:
    """Array source → SparkDataset of long-format variables
    (vpicdataset.py:171-230 semantics, DataFrame storage)."""
    names = list(source.datasets)
    if not names:
        return SparkDataset(params=dict(params or {}))
    t_dset, *full_mesh = source.get_grid(names[0])
    default_mesh = []
    empty_dims = []
    for i, axis in enumerate(full_mesh):
        if len(axis) > 1:
            default_mesh.append(np.asarray(axis, dtype=float))
        else:
            empty_dims.append(i)

    ds = SparkDataset(
        params=dict(params or {}),
        timeseries=np.asarray(t_dset, dtype=float),
        default_mesh=default_mesh,
    )
    for name in select_vars(names, get_vars):
        label = name.split("/")[-1]
        var_t, *var_full_mesh = source.get_grid(name)
        if len(var_t) == len(t_dset) and np.array_equal(var_t, t_dset):
            var_t = t_dset  # share (vpicdataset.py:219-220)
        same = len(var_full_mesh) == len(full_mesh) and all(
            np.array_equal(var_full_mesh[i], full_mesh[i])
            for i in range(len(full_mesh))
        )
        if same:
            var_mesh = default_mesh
        else:
            # drop the VARIABLE'S OWN length-1 axes, matching the
            # np.squeeze below — filtering by the DATASET's empty_dims
            # (the reference's literal form) mismatches when the
            # variable's degeneracy pattern differs from the default
            # grid's (e.g. dataset (z=12, y=1, x=10) but variable
            # (z=1, y=8, x=10)): the mesh would keep the len-1 axis
            # and drop a real one, and from_numpy raises on the
            # mesh/data shape mismatch (round-9 review)
            var_mesh = [
                np.asarray(m, dtype=float)
                for m in var_full_mesh
                if len(m) > 1
            ]
        data = np.squeeze(source[name])  # drop all len-1 dims (:229)
        if data.ndim == len(var_mesh):  # single-timestep source
            data = data[None]
        var = SparkVariable.from_numpy(
            spark, label, np.asarray(var_t, dtype=float), var_mesh, data
        )
        if same:
            # share the cached coordinate arrays with the dataset, the
            # reference's share-data-in-memory intent (:219-224)
            var._timeseries = ds.timeseries
            var._mesh = default_mesh
        ds.add_var(var)
    return ds


def read_params(
    path: str, paramlist: Sequence[str] | None = None
) -> dict[str, float | int | str]:
    """`key value` parameter-file parser — implements the reference's
    own TODO (vpicdataset.py:232-245). Lines starting with '#' are
    comments; values are coerced int → float → str; `paramlist`
    restricts which keys are kept (None keeps all)."""
    out: dict[str, float | int | str] = {}
    want = set(paramlist) if paramlist is not None else None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            key, _, raw = line.partition(" ")
            raw = raw.strip()
            if want is not None and key not in want:
                continue
            value: float | int | str
            try:
                value = int(raw)
            except ValueError:
                try:
                    value = float(raw)
                except ValueError:
                    value = raw
            out[key] = value
    return out


# --- driver-checkable query ------------------------------------------------


def _synthetic_source() -> DictArraySource:
    """Deterministic 3-variable source with a degenerate y axis and an
    exactly-representable polynomial field, so the DuckDB oracle can
    regenerate identical doubles without libm concerns."""
    t = np.arange(3, dtype=float) * 2.0
    z = np.arange(12, dtype=float) * 0.5
    y = np.zeros(1)  # degenerate → squeezed
    x = np.arange(10, dtype=float) * 0.25
    tt = t[:, None, None]
    zz = np.arange(12, dtype=float)[None, :, None]
    xx = np.arange(10, dtype=float)[None, None, :]
    arrays = {
        "fields/ex": (0.25 * zz * zz - 0.5 * xx + tt) * np.ones((3, 12, 10)),
        "fields/bz": (zz - xx * 0.125 + 2.0 * tt) * np.ones((3, 12, 10)),
        "hydro/jy": (zz * xx * 0.0625 - tt) * np.ones((3, 12, 10)),
    }
    grid = (t, z, y, x)
    # data arrives with the degenerate y axis present, as from a file
    arrays = {k: v[:, :, None, :] for k, v in arrays.items()}
    return DictArraySource(arrays, {k: grid for k in arrays})


def q_array_ingest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest the synthetic source (get_vars picks ex+jy, first-match
    semantics), export → restore round-trip, return the restored 'ex'
    rows. The oracle regenerates the identical long-format rows in
    SQL, so the hash pins: substring selection, degenerate-dim
    squeeze, long-format explosion, and export/restore fidelity."""
    import shutil
    import tempfile

    src = _synthetic_source()
    ds = ingest_arrays(spark, src, get_vars=["ex", "jy"])
    assert set(ds.variables) == {"ex", "jy"}, sorted(ds.variables)
    tmp = tempfile.mkdtemp(prefix="array_ingest_rt_")
    try:
        ds.export(tmp)
        back = SparkDataset.restore(spark, tmp)
        from pyspark.sql import functions as F

        out = (
            back.variables["ex"]
            .df.select(
                "t",
                "i0",
                "i1",
                "c0",
                "c1",
                F.round("value", 6).alias("value"),
            )
            .orderBy("t", "i0", "i1")
        )
        # materialize before deleting the backing files (the returned
        # plan would otherwise read a vanished directory lazily); the
        # round-trip table is small by construction (360 rows)
        pdf = out.toPandas()
        return spark.createDataFrame(pdf, schema=out.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


Q_ARRAY_INGEST_ROUNDTRIP_SQL = """
SELECT
  t.x * 2.0                              AS t,
  z.x                                    AS i0,
  xx.x                                   AS i1,
  z.x * 0.5                              AS c0,
  xx.x * 0.25                            AS c1,
  round(0.25 * z.x * z.x - 0.5 * xx.x + t.x * 2.0, 6) AS value
FROM range(3) t(x), range(12) z(x), range(10) xx(x)
ORDER BY t, i0, i1
"""
