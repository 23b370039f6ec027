"""Native IO bridge: compile-on-demand C++ CSV parser + binary cache.

The extension (native/thzio.cpp) is built with g++ the first time it is
needed and cached under native/build/.  Every entry point degrades
gracefully to the pandas path (data_loader-equivalent behaviour) when no
toolchain is present, so the framework stays pure-Python-runnable.

Public surface:
- load_csv_native(path, cfg)  -> ThzDataset   (drop-in for dataset.load_csv)
- cache_dataset / load_cached -> binary .thzb round trip (mmap + memcpy,
  ~100x faster than CSV re-parsing for big corpora)
- native_available()          -> bool
"""

from __future__ import annotations

import os
import subprocess
import sysconfig
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "thzio.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")

_module = None
_build_failed = False


def _so_path() -> str:
    tag = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(_BUILD_DIR, f"thzio{tag}")


def _build() -> Optional[str]:
    """Compile the extension; returns the .so path or None."""
    so = _so_path()
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(_SRC):
        return so
    os.makedirs(_BUILD_DIR, exist_ok=True)
    py_inc = sysconfig.get_paths()["include"]
    np_inc = np.get_include()
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        f"-I{py_inc}", f"-I{np_inc}", _SRC, "-o", so,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return so
    except Exception:
        return None


def _load():
    global _module, _build_failed
    if _module is not None or _build_failed:
        return _module
    if not os.path.exists(_SRC):
        _build_failed = True
        return None
    so = _build()
    if so is None:
        _build_failed = True
        return None
    import importlib.util

    spec = importlib.util.spec_from_file_location("thzio", so)
    mod = importlib.util.module_from_spec(spec)
    try:
        spec.loader.exec_module(mod)
    except Exception:
        _build_failed = True
        return None
    _module = mod
    return _module


def native_available() -> bool:
    return _load() is not None


def parse_csv(path: str):
    """(header, float32 array) via the native parser, pandas fallback."""
    mod = _load()
    if mod is not None:
        return mod.parse_csv(path)
    import pandas as pd

    df = pd.read_csv(path)
    return list(df.columns), df.to_numpy(dtype=np.float32)


def load_csv_native(path: str, cfg):
    """Drop-in replacement for dataset.load_csv using the native parser;
    reproduces the same column discovery/validation semantics."""
    from ..config import METRIC_NAMES, PARAM_NAMES
    from .dataset import build_dataset, discover_spectrum_schema

    header, data = parse_csv(path)
    col = {name: i for i, name in enumerate(header)}

    # shared schema discovery/validation (dataset.py) — the native and
    # pandas loaders must agree column-for-column
    spec_cols, freqs = discover_spectrum_schema(header)

    spectra = data[:, [col[c] for c in spec_cols]]
    params = data[:, [col[c] for c in PARAM_NAMES]]
    metrics = data[:, [col[c] for c in METRIC_NAMES]]
    if len(spec_cols) != cfg.spectrum_dim:
        from ..config import DataConfig

        cfg = DataConfig(**{**cfg.__dict__, "spectrum_dim": len(spec_cols)})
    return build_dataset(spectra, params, metrics, cfg, frequencies=freqs)


# ---------------------------------------------------------------------------
# Binary cache (.thzb): [spectra | params | metrics] stacked column-wise
# ---------------------------------------------------------------------------


def cache_dataset(ds, path: str) -> None:
    mod = _load()
    block = np.concatenate(
        [np.asarray(ds.spectra), np.asarray(ds.params), np.asarray(ds.metrics)],
        axis=1,
    ).astype(np.float32)
    if mod is not None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        mod.write_cache(path, block)
    else:
        np.save(path + ".npy", block)


def load_cached(path: str, cfg):
    from .dataset import build_dataset

    mod = _load()
    if mod is not None and os.path.exists(path):
        block = mod.read_cache(path)
    elif os.path.exists(path + ".npy"):
        block = np.load(path + ".npy")
    elif os.path.exists(path):
        # the native-format cache is there but the extension isn't — a
        # FileNotFoundError here would misdiagnose the real cause
        raise RuntimeError(
            f"native cache {path} exists but the C++ extension is "
            "unavailable on this host (g++/build failure?); rebuild the "
            "extension or re-cache on this machine"
        )
    else:
        raise FileNotFoundError(path)
    s = cfg.spectrum_dim
    p = cfg.param_dim
    return build_dataset(block[:, :s], block[:, s : s + p], block[:, s + p :], cfg)
