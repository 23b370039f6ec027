"""CSV robustness property tests (VERDICT r3 #6): messy real-world CSVs
through BOTH the native C++ parser and the pandas path must produce
bit-identical dataset tensors (data_loader.py:159-176 semantics;
native/thzio.cpp).  Plus the metadata-only loader (the reference's
``load_data=False`` fixture mode)."""

import numpy as np
import pytest

from pigan_thz_tpu.config import DataConfig, METRIC_NAMES, PARAM_NAMES
from pigan_thz_tpu.data import load_csv, load_metadata
from pigan_thz_tpu.data.native_io import load_csv_native, native_available

CFG = DataConfig(num_samples=8)


def _rows(n, s=6, seed=0, nan_metrics=False, sci=False):
    rng = np.random.default_rng(seed)
    freqs = np.linspace(0.5, 3.0, s)
    cols = [f"Freq_{f:.2f}" for f in freqs]
    header = list(PARAM_NAMES) + cols + list(METRIC_NAMES)
    body = []
    for i in range(n):
        vals = list(rng.uniform(1.0, 9.0, len(PARAM_NAMES)))
        vals += list(rng.uniform(-30.0, 0.0, s))
        mets = rng.uniform(0.5, 3.0, len(METRIC_NAMES))
        if nan_metrics and i % 3 == 0:
            mets[i % len(METRIC_NAMES)] = np.nan
        vals += list(mets)
        if sci:
            body.append(",".join(f"{v:.6e}" for v in vals))
        else:
            body.append(",".join(f"{v:.6f}" for v in vals))
    return header, body


def _write(tmp_path, header, body, name="d.csv", eol="\n", nan_text="nan"):
    text = eol.join([",".join(header)] + body) + eol
    text = text.replace("nan", nan_text)
    p = tmp_path / name
    p.write_bytes(text.encode())
    return str(p)


def _both(path):
    """(native, pandas) datasets; skip if the native extension can't build."""
    if not native_available():
        pytest.skip("native csv extension unavailable")
    return load_csv_native(path, CFG), load_csv(path, CFG)


def _assert_identical(a, b):
    for name in a._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name,
        )


def test_plain_csv_parsers_agree(tmp_path):
    path = _write(tmp_path, *_rows(8))
    a, b = _both(path)
    _assert_identical(a, b)
    assert a.spectrum_dim == 6 and a.num_samples == 8


def test_nan_metric_rows(tmp_path):
    """NaN metrics must flow through both parsers and normalize to 0.5
    (data_loader.py NaN policy), not crash or diverge."""
    path = _write(tmp_path, *_rows(9, nan_metrics=True))
    a, b = _both(path)
    _assert_identical(a, b)
    mn = np.asarray(a.metrics_norm)
    nan_mask = np.isnan(np.asarray(a.metrics))
    assert nan_mask.any()
    np.testing.assert_array_equal(mn[nan_mask], 0.5)


def test_shuffled_spectrum_columns(tmp_path):
    """Freq_* columns in scrambled file order must sort numerically —
    both parsers must agree AND match the in-order file."""
    header, body = _rows(8)
    order = np.random.default_rng(3).permutation(len(header))
    sh_header = [header[i] for i in order]
    sh_body = [
        ",".join(np.array(r.split(","))[order]) for r in body
    ]
    p_shuffled = _write(tmp_path, sh_header, sh_body, "s.csv")
    p_plain = _write(tmp_path, header, body, "p.csv")
    a, b = _both(p_shuffled)
    _assert_identical(a, b)
    ref = load_csv(p_plain, CFG)
    _assert_identical(a, ref)


def test_missing_metric_column_raises(tmp_path):
    header, body = _rows(4)
    drop = header.index(METRIC_NAMES[2])
    header2 = header[:drop] + header[drop + 1:]
    body2 = [",".join(r.split(",")[:drop] + r.split(",")[drop + 1:]) for r in body]
    path = _write(tmp_path, header2, body2)
    if native_available():
        with pytest.raises(ValueError, match="missing required"):
            load_csv_native(path, CFG)
    with pytest.raises(ValueError, match="missing required"):
        load_csv(path, CFG)


def test_crlf_line_endings(tmp_path):
    header, body = _rows(8)
    a, b = _both(_write(tmp_path, header, body, "crlf.csv", eol="\r\n"))
    _assert_identical(a, b)
    ref = load_csv(_write(tmp_path, header, body, "lf.csv"), CFG)
    _assert_identical(a, ref)


def test_scientific_notation(tmp_path):
    header, body = _rows(8, sci=True)
    a, b = _both(_write(tmp_path, header, body))
    _assert_identical(a, b)


def test_nan_spellings(tmp_path):
    """'NaN' capitalization variants parse identically."""
    header, body = _rows(9, nan_metrics=True)
    a, b = _both(_write(tmp_path, header, body, "u.csv", nan_text="NaN"))
    _assert_identical(a, b)


def test_metadata_only_csv(tmp_path):
    header, body = _rows(8)
    path = _write(tmp_path, header, body)
    md = load_metadata(CFG, path)
    assert md.spectrum_dim == 6
    assert md.num_samples == 8
    assert md.param_names == tuple(PARAM_NAMES)
    assert md.metric_names == tuple(METRIC_NAMES)
    np.testing.assert_allclose(md.frequencies, np.linspace(0.5, 3.0, 6), atol=5e-3)
    # full-load agreement on the discovered grid
    ds = load_csv(path, CFG)
    np.testing.assert_array_equal(md.frequencies, np.asarray(ds.frequencies))


def test_metadata_only_config():
    md = load_metadata(CFG)
    assert md.num_samples is None
    assert md.spectrum_dim == CFG.spectrum_dim
    assert len(md.frequencies) == CFG.spectrum_dim


def test_metadata_validation(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_metadata(CFG, str(tmp_path / "missing.csv"))
    p = tmp_path / "bad.csv"
    p.write_text("a,b,c\n1,2,3\n")
    with pytest.raises(ValueError, match="Freq_"):
        load_metadata(CFG, str(p))


def test_whitespace_only_line_skipped_like_pandas(tmp_path):
    """A whitespace-only data line (e.g. a trailing '   \\n') is skipped by
    pandas skip_blank_lines; the native parser must skip it too instead of
    raising 'unparseable rows' (review r4)."""
    header, body = _rows(6)
    body.insert(3, "   ")
    body.append("  ")
    path = _write(tmp_path, header, body)
    a, b = _both(path)
    assert np.asarray(a.spectra).shape[0] == 6
    _assert_identical(a, b)


def test_partial_numeric_token_does_not_shift_columns(tmp_path):
    """'0x1A' / '1.5abc' are ONE non-numeric field (pandas would make the
    column object dtype); the native parser must yield NaN for the field
    and keep later columns aligned, not split the token in two (review
    r4).  Pandas' to_numpy(float32) raises on such files, so this is a
    native-only contract check."""
    if not native_available():
        pytest.skip("native csv extension unavailable")
    header, body = _rows(3)
    parts = body[1].split(",")
    last = parts[-1]
    parts[0] = "0x1A"        # partial-numeric first field
    parts[2] = "1.5abc"
    body[1] = ",".join(parts)
    path = _write(tmp_path, header, body)
    ds = load_csv_native(path, CFG)
    # the final column's value survived in place (no shift)
    from pigan_thz_tpu.config import METRIC_NAMES as _MN  # noqa: F401
    assert np.isclose(float(np.asarray(ds.metrics)[1, -1]), float(last))


def test_huge_exponent_is_inf_not_garbage(tmp_path):
    """'1e2147483650' must saturate to inf (strtof semantics), not wrap the
    exponent accumulator into an arbitrary finite value (review r4)."""
    if not native_available():
        pytest.skip("native csv extension unavailable")
    header, body = _rows(2)
    parts = body[0].split(",")
    # a spectrum column (params are range-normalized; keep those sane)
    parts[len(PARAM_NAMES)] = "1e2147483650"
    body[0] = ",".join(parts)
    path = _write(tmp_path, header, body)
    ds = load_csv_native(path, CFG)
    assert np.isposinf(np.asarray(ds.spectra)[0].max())
