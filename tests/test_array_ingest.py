"""Ingestion-module parity tests (SURVEY.md §2.1): the array-source
scan reproduces VPICDataset._init_vpicfile semantics — substring
get_vars with first-match-then-break, degenerate-dim squeeze, label
trimming, mesh sharing — against in-memory sources, plus the
from_numpy equivalence and the param-file parser."""

from __future__ import annotations

import numpy as np
import pytest

from data_framework_spark.sources.array_ingest import (
    DictArraySource,
    ingest_arrays,
    read_params,
    select_vars,
)
from data_framework_spark.variable import SparkVariable


def _source():
    t = np.array([0.0, 1.0])
    z = np.linspace(-1, 1, 5)
    y = np.zeros(1)
    x = np.linspace(0, 3, 4)
    rng = np.random.default_rng(42)
    arrays = {
        "fields/ex": rng.normal(size=(2, 5, 1, 4)),
        "fields/ey": rng.normal(size=(2, 5, 1, 4)),
        "hydro/jy": rng.normal(size=(2, 5, 1, 4)),
    }
    return DictArraySource(arrays, {k: (t, z, y, x) for k in arrays}), arrays, (t, z, x)


def test_select_vars_first_match_break_semantics():
    names = ["fields/ex", "fields/ey", "hydro/jy"]
    # 'e' matches BOTH ex and ey but takes only the first, then breaks
    # (vpicdataset.py:206-213, kept bug-for-bug)
    assert select_vars(names, ["e"]) == ["fields/ex"]
    assert select_vars(names, ["ey", "jy"]) == ["fields/ey", "hydro/jy"]
    assert select_vars(names, ["all"]) == names
    assert select_vars(names, None) == names
    assert select_vars(names, ["EX"]) == []  # case-sensitive


def test_ingest_squeezes_degenerate_dims_and_trims_labels(spark):
    src, arrays, (t, z, x) = _source()
    ds = ingest_arrays(spark, src)
    assert set(ds.variables) == {"ex", "ey", "jy"}
    # default mesh dropped the len-1 y axis: z,x remain
    assert len(ds.default_mesh) == 2
    np.testing.assert_array_equal(ds.default_mesh[0], z)
    np.testing.assert_array_equal(ds.default_mesh[1], x)
    # variables share the dataset mesh object (vpicdataset.py:219-224)
    assert ds.variables["ex"]._mesh is ds.default_mesh
    # data round-trips through the long format
    got = ds.variables["jy"].to_numpy()
    np.testing.assert_allclose(got, np.squeeze(arrays["hydro/jy"]))


def test_ingest_matches_from_numpy(spark):
    src, arrays, (t, z, x) = _source()
    ds = ingest_arrays(spark, src, get_vars=["ex"])
    direct = SparkVariable.from_numpy(
        spark, "ex", t, [z, x], np.squeeze(arrays["fields/ex"])
    )
    a = sorted(map(tuple, ds.variables["ex"].df.collect()))
    b = sorted(map(tuple, direct.df.collect()))
    assert a == b


def test_ingest_single_timestep_gets_time_axis(spark):
    t = np.array([5.0])
    z = np.linspace(0, 1, 3)
    x = np.linspace(0, 1, 3)
    data = np.ones((1, 3, 1, 3))
    src = DictArraySource(
        {"b1": data}, {"b1": (t, z, np.zeros(1), x)}
    )
    ds = ingest_arrays(spark, src)
    # squeeze drops the t axis too (len 1); ingest restores it
    assert ds.variables["b1"].to_numpy().shape == (1, 3, 3)


def test_read_params(tmp_path):
    p = tmp_path / "info"
    p.write_text("# comment\nnx 64\nde 1.5\nname harris\n\nnz 128\n")
    assert read_params(str(p)) == {
        "nx": 64,
        "de": 1.5,
        "name": "harris",
        "nz": 128,
    }
    assert read_params(str(p), paramlist=["de", "nx"]) == {"nx": 64, "de": 1.5}


def test_roundtrip_query_matches_duckdb(spark):
    import duckdb

    from data_framework_spark.sources.array_ingest import (
        Q_ARRAY_INGEST_ROUNDTRIP_SQL,
        q_array_ingest_roundtrip,
    )

    sdf = q_array_ingest_roundtrip(spark, "")
    srows = sorted(map(tuple, (tuple(r) for r in sdf.collect())))
    drows = sorted(map(tuple, duckdb.sql(Q_ARRAY_INGEST_ROUNDTRIP_SQL).fetchall()))
    assert srows == drows
