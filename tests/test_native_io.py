"""Native C++ IO tests: parser parity vs pandas, cache round trip, edge
cases (NaN fields, scientific notation, negative exponents), fallback."""

import os

import numpy as np
import pytest

from pigan_thz_tpu.config import DataConfig
from pigan_thz_tpu.data import load_csv, save_csv
from pigan_thz_tpu.data.native_io import (
    cache_dataset,
    load_cached,
    load_csv_native,
    native_available,
    parse_csv,
)

needs_native = pytest.mark.skipif(
    not native_available(), reason="g++ toolchain unavailable"
)


@needs_native
def test_parse_csv_parity(tmp_path, small_ds, cfg):
    path = str(tmp_path / "p.csv")
    save_csv(small_ds, path)
    header, data = parse_csv(path)
    import pandas as pd

    df = pd.read_csv(path)
    assert header == list(df.columns)
    np.testing.assert_array_equal(data, df.to_numpy(dtype=np.float32))


@needs_native
def test_load_csv_native_matches_pandas_loader(tmp_path, small_ds, cfg):
    path = str(tmp_path / "d.csv")
    save_csv(small_ds, path)
    a = load_csv_native(path, cfg.data)
    b = load_csv(path, cfg.data)
    np.testing.assert_array_equal(np.asarray(a.spectra), np.asarray(b.spectra))
    np.testing.assert_array_equal(np.asarray(a.params_norm), np.asarray(b.params_norm))
    np.testing.assert_array_equal(
        np.asarray(a.metrics_norm), np.asarray(b.metrics_norm)
    )


@needs_native
def test_parse_edge_cases(tmp_path):
    path = str(tmp_path / "edge.csv")
    with open(path, "w") as fh:
        fh.write("a,b,c,d\n")
        fh.write("1.5,-2.25e-3,nan,1e5\n")
        fh.write("-0.0,3,4.75E+2,\n")
    header, data = parse_csv(path)
    assert header == ["a", "b", "c", "d"]
    np.testing.assert_allclose(data[0, 0], 1.5)
    np.testing.assert_allclose(data[0, 1], -2.25e-3, rtol=1e-6)
    assert np.isnan(data[0, 2])
    np.testing.assert_allclose(data[0, 3], 1e5)
    np.testing.assert_allclose(data[1, 2], 475.0)
    assert np.isnan(data[1, 3])  # trailing empty field


@needs_native
def test_cache_roundtrip(tmp_path, small_ds, cfg):
    path = str(tmp_path / "c.thzb")
    cache_dataset(small_ds, path)
    ds2 = load_cached(path, cfg.data)
    np.testing.assert_array_equal(np.asarray(ds2.spectra), np.asarray(small_ds.spectra))
    np.testing.assert_array_equal(np.asarray(ds2.params), np.asarray(small_ds.params))
    nan_mask = np.isnan(np.asarray(small_ds.metrics))
    np.testing.assert_array_equal(
        np.asarray(ds2.metrics)[~nan_mask], np.asarray(small_ds.metrics)[~nan_mask]
    )


@needs_native
def test_cache_rejects_garbage(tmp_path):
    path = str(tmp_path / "bad.thzb")
    with open(path, "wb") as fh:
        fh.write(b"not a cache file at all, definitely")
    with pytest.raises(ValueError):
        load_cached(path, DataConfig())


def test_parse_csv_fallback_works(tmp_path, small_ds):
    """Even without the toolchain, parse_csv must return data (pandas)."""
    path = str(tmp_path / "f.csv")
    save_csv(small_ds, path)
    header, data = parse_csv(path)
    assert len(header) == data.shape[1]
    assert data.shape[0] == small_ds.num_samples


@needs_native
def test_mid_row_empty_field_no_column_shift(tmp_path):
    """'1.0,,3.0,4.0' must parse to [1, NaN, 3, 4] like pandas — an empty
    mid-row field may NOT shift subsequent values left."""
    path = str(tmp_path / "mid.csv")
    with open(path, "w") as fh:
        fh.write("a,b,c,d\n1.0,,3.0,4.0\n,2.0,,\n")
    header, data = parse_csv(path)
    np.testing.assert_allclose(data[0, [0, 2, 3]], [1.0, 3.0, 4.0])
    assert np.isnan(data[0, 1])
    assert np.isnan(data[1, 0]) and np.isnan(data[1, 2]) and np.isnan(data[1, 3])
    np.testing.assert_allclose(data[1, 1], 2.0)


@needs_native
def test_no_trailing_newline_nan_token(tmp_path):
    """File ending in a fallback token with no trailing newline must not
    read past the mapping (strtof bounded-buffer path)."""
    path = str(tmp_path / "tail.csv")
    with open(path, "w") as fh:
        fh.write("a,b\n1.5,nan")  # no trailing newline
    header, data = parse_csv(path)
    np.testing.assert_allclose(data[0, 0], 1.5)
    assert np.isnan(data[0, 1])
