"""Raw CST export → Freq_* CSV converter (data/cst.py) — VERDICT r4 #7.

The reference's real CSV is a missing blob upstream, but the raw CST
export format is documented by `/root/reference/dataset/THZ.txt:1-4`.
These tests build synthetic exports in that exact format (multi-block,
CRLF, comment noise), convert them, and train end-to-end from the
converted file — proving the framework ingests the reference's actual
data artifacts, not just self-generated CSVs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pigan_thz_tpu.config import DataConfig
from pigan_thz_tpu.data import load_csv, synthesize_spectra
from pigan_thz_tpu.data.cst import (
    blocks_to_arrays,
    convert_cst_export,
    parse_cst_export,
)

_REFERENCE_SAMPLE = "/root/reference/dataset/THZ.txt"


def _write_cst(path, blocks, sep="\t", crlf=False, extra_params=""):
    """blocks: list of (params_dict, freq, values)."""
    nl = "\r\n" if crlf else "\n"
    with open(path, "w", newline="") as fh:
        for params, freq, vals in blocks:
            inner = "; ".join(f"{k}={v}" for k, v in params.items())
            if extra_params:
                inner += "; " + extra_params
            fh.write(f"#Parameters = {{{inner}}}{nl}")
            fh.write(f'#"Frequency / THz"{sep}"S2,1 (3) [Magnitude / dB]"{nl}')
            fh.write("#" + "-" * 45 + nl)
            for f, v in zip(freq, vals):
                fh.write(f"{f:.14f}{sep}{v:.13f}{nl}")


def _synthetic_blocks(n, n_points=400, seed=0):
    """CST-format blocks whose spectra come from the synthetic generator
    (params inside the dataset's 2.2-2.8 range, denser sweep grid)."""
    cfg = DataConfig()
    key = jax.random.PRNGKey(seed)
    params = np.asarray(
        jax.random.uniform(key, (n, 4), minval=2.25, maxval=2.75)
    )
    freq = np.linspace(cfg.freq_min, cfg.freq_max, n_points)
    spec = np.asarray(
        synthesize_spectra(jnp.asarray(freq, jnp.float32),
                           jnp.asarray(params, jnp.float32),
                           key=jax.random.PRNGKey(seed + 1))
    )
    return [
        (
            {"d": 500, "p": 50, "r1": params[i, 0], "r2": params[i, 1],
             "w": params[i, 2], "g": params[i, 3], "t": 0.2},
            freq, spec[i],
        )
        for i in range(n)
    ]


def test_parse_multiblock_crlf(tmp_path):
    blocks = _synthetic_blocks(3)
    p = str(tmp_path / "export.txt")
    _write_cst(p, blocks, crlf=True, extra_params="Mesh Pass=3; name=run_a")
    got = parse_cst_export(p)
    assert len(got) == 3
    for (params, freq, vals), blk in zip(blocks, got):
        assert blk.params["r1"] == pytest.approx(params["r1"], rel=1e-6)
        assert "Mesh Pass" in blk.params      # spaced key parsed
        assert "name" not in blk.params       # non-numeric values skipped
        np.testing.assert_allclose(blk.freq, freq, rtol=1e-9)
        np.testing.assert_allclose(blk.values, vals, rtol=1e-9)


def test_resample_and_param_mapping(tmp_path):
    blocks = _synthetic_blocks(2, n_points=617)   # odd grid → real interp
    # record the gap under the export key "p" and drop "g"
    renamed = [
        ({**{k: v for k, v in ps.items() if k != "g"}, "p": ps["g"]}, f, v)
        for ps, f, v in blocks
    ]
    p = str(tmp_path / "export.txt")
    _write_cst(p, renamed)
    cfg = DataConfig()
    with pytest.raises(ValueError, match="structural parameter 'g'"):
        blocks_to_arrays(parse_cst_export(p), cfg)
    params, spectra = blocks_to_arrays(
        parse_cst_export(p), cfg, param_map={"g": "p"}
    )
    assert params.shape == (2, 4) and spectra.shape == (2, cfg.spectrum_dim)
    assert params[0, 3] == pytest.approx(blocks[0][0]["g"], rel=1e-6)
    # linear resampling of a dense grid reproduces the generator's values
    direct = np.asarray(
        synthesize_spectra(
            cfg.frequencies,
            jnp.asarray(params, jnp.float32), key=None, noise_level=0.0,
        )
    )
    # noise_level in the blocks was on; compare against interp of the noisy
    # source instead of the clean generator — just bound the gross error
    assert np.abs(spectra - direct).max() < 1.0


def test_sweep_coverage_check(tmp_path):
    blocks = _synthetic_blocks(1)
    ps, f, v = blocks[0]
    short = (ps, f[: 300], v[: 300])   # sweep stops before freq_max
    p = str(tmp_path / "short.txt")
    _write_cst(p, [short])
    with pytest.raises(ValueError, match="does not cover"):
        blocks_to_arrays(parse_cst_export(p), DataConfig())
    # fit_grid derives the grid from the sweep instead
    n = convert_cst_export(p, str(tmp_path / "short.csv"), fit_grid=True,
                           defaults={"g": 2.5})
    assert n == 1
    ds = load_csv(str(tmp_path / "short.csv"), DataConfig())
    assert float(ds.frequencies[-1]) <= float(f[299]) + 1e-6


def test_convert_and_train_end_to_end(tmp_path, cfg):
    """The VERDICT 'done' bar: a converted export trains end-to-end."""
    from pigan_thz_tpu.train.trainer import Trainer

    blocks = _synthetic_blocks(128, seed=3)
    raw = str(tmp_path / "export.txt")
    _write_cst(raw, blocks)
    out = str(tmp_path / "converted.csv")
    n = convert_cst_export(raw, out)
    assert n == 128
    ds = load_csv(out, cfg.data)
    assert ds.num_samples == 128
    assert np.isfinite(np.asarray(ds.spectra)).all()
    assert np.isfinite(np.asarray(ds.metrics_norm)).all()  # NaN→0.5 policy
    t = Trainer(cfg, ds=ds, epochs_per_call=2, megakernel="off")
    t.pretrain_forward(epochs=4)
    losses = t.train_history["forward/loss"]
    assert len(losses) == 4 and losses[-1] < losses[0]


@pytest.mark.skipif(
    not os.path.exists(_REFERENCE_SAMPLE),
    reason="reference CST sample not present",
)
def test_reference_thz_txt_converts(tmp_path):
    """The actual in-repo reference artifact (sweeps 0.5-2.75 THz, no 'g'
    parameter) converts with fit_grid + a default."""
    out = str(tmp_path / "ref.csv")
    n = convert_cst_export(
        _REFERENCE_SAMPLE, out, fit_grid=True, defaults={"g": 2.5},
    )
    assert n == 1
    ds = load_csv(out, DataConfig())
    assert ds.spectrum_dim == 250
    assert float(ds.frequencies[0]) == pytest.approx(0.5, abs=1e-6)
    assert float(ds.frequencies[-1]) == pytest.approx(2.75, abs=1e-6)
    # the sample's r1=40, r2=15, w=2.5 geometry rides through verbatim
    assert float(ds.params[0, 0]) == pytest.approx(40.0)
    assert np.isfinite(np.asarray(ds.spectra)).all()


def test_parser_robust_to_junk_interleaving(tmp_path):
    """Property fuzz: random comment/junk/blank lines interleaved between
    data rows must not change the parsed blocks (CST exports in the wild
    carry headers, units lines, and Windows line endings)."""
    rng = np.random.default_rng(13)
    blocks = _synthetic_blocks(2, n_points=120, seed=5)
    clean = str(tmp_path / "clean.txt")
    _write_cst(clean, blocks)
    ref = parse_cst_export(clean)
    junk_lines = [
        "# a comment", "#---", '#"Frequency / THz" "S2,1"', "", "   ",
        "not a number at all", "only_one_col",
    ]
    for trial in range(5):
        lines = open(clean).read().splitlines()
        out = []
        for ln in lines:
            out.append(ln)
            if rng.random() < 0.3:
                out.append(junk_lines[rng.integers(len(junk_lines))])
        noisy = str(tmp_path / f"noisy{trial}.txt")
        with open(noisy, "w") as fh:
            fh.write("\r\n".join(out) if trial % 2 else "\n".join(out))
        got = parse_cst_export(noisy)
        assert len(got) == len(ref)
        for a, b in zip(got, ref):
            assert a.params == b.params
            np.testing.assert_allclose(a.freq, b.freq, rtol=1e-12)
            np.testing.assert_allclose(a.values, b.values, rtol=1e-12)
