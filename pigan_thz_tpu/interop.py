"""Reference-artifact interop: torch ``.pth`` <-> flax variables.

A user holding reference-trained checkpoints (the ``*_final.pth`` trio
written at train_pigan.py:301-303 and read back at
unified_evaluator.py:55-111, or the wrapped training checkpoints of
train_pigan.py:283-295 / unified_constraint_trainer.py:1114-1138) can load
them straight into this framework for evaluation/fine-tuning — and export
flax-trained weights back out in the reference's layout.

Mapping rules (baseline trio only; the enhanced variants have no recorded
reference artifacts):
- torch ``nn.Linear.weight`` is (out, in); flax ``nn.Dense.kernel`` is
  (in, out) -> transpose.
- torch BatchNorm1d ``weight/bias/running_mean/running_var`` map to flax
  ``scale/bias`` (params) + ``mean/var`` (batch_stats); eps 1e-5 both sides.
- torch LayerNorm ``weight/bias`` -> flax ``scale/bias``.  torch eps is
  1e-5, flax default 1e-6 — a sub-1e-5 relative output delta, verified in
  tests/test_interop.py round trips.

No torch import happens at module import time; only the ``.pth`` readers
require it (torch-cpu ships in this environment).
"""

from __future__ import annotations

import os
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

# (torch prefix, flax path prefix, layer kind). flax paths are
# '/'-separated; the leading collection ("params"/"batch_stats") is implied
# by the kind.
LayerMap = List[Tuple[str, str, str]]

GENERATOR_MAP: LayerMap = [
    ("main.0", "MLPBlock_0/Dense_0", "linear"),
    ("main.1", "MLPBlock_0/NormAct_0/BatchNorm_0", "batchnorm"),
    ("main.3", "MLPBlock_1/Dense_0", "linear"),
    ("main.4", "MLPBlock_1/NormAct_0/BatchNorm_0", "batchnorm"),
    ("main.6", "Dense_0", "linear"),
]

DISCRIMINATOR_MAP: LayerMap = [
    ("main.0", "Dense_0", "linear"),
    ("main.2", "Dense_1", "linear"),
    ("main.4", "Dense_2", "linear"),
]

FORWARD_MODEL_MAP: LayerMap = [
    *(
        entry
        for i in range(5)
        for entry in (
            (f"model.{4 * i}", f"MLPBlock_{i}/Dense_0", "linear"),
            (f"model.{4 * i + 1}", f"MLPBlock_{i}/NormAct_0/LayerNorm_0", "layernorm"),
        )
    ),
    ("model.20", "Dense_0", "linear"),
]


def _as_np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def _set(tree: dict, path: str, leaf) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = leaf


def _get(tree: dict, path: str):
    node = tree
    for p in path.split("/"):
        node = node[p]
    return node


# ---------------------------------------------------------------------------
# torch state_dict -> flax variables
# ---------------------------------------------------------------------------


def torch_to_flax(state_dict: Dict, mapping: LayerMap) -> dict:
    """Convert a torch state_dict to flax variables
    {"params": ..., ["batch_stats": ...]} following `mapping`."""
    params: dict = {}
    stats: dict = {}
    for tkey, fpath, kind in mapping:
        if kind == "linear":
            _set(params, f"{fpath}/kernel",
                 jnp.asarray(_as_np(state_dict[f"{tkey}.weight"]).T))
            _set(params, f"{fpath}/bias",
                 jnp.asarray(_as_np(state_dict[f"{tkey}.bias"])))
        elif kind == "layernorm":
            _set(params, f"{fpath}/scale",
                 jnp.asarray(_as_np(state_dict[f"{tkey}.weight"])))
            _set(params, f"{fpath}/bias",
                 jnp.asarray(_as_np(state_dict[f"{tkey}.bias"])))
        elif kind == "batchnorm":
            _set(params, f"{fpath}/scale",
                 jnp.asarray(_as_np(state_dict[f"{tkey}.weight"])))
            _set(params, f"{fpath}/bias",
                 jnp.asarray(_as_np(state_dict[f"{tkey}.bias"])))
            _set(stats, f"{fpath}/mean",
                 jnp.asarray(_as_np(state_dict[f"{tkey}.running_mean"])))
            _set(stats, f"{fpath}/var",
                 jnp.asarray(_as_np(state_dict[f"{tkey}.running_var"])))
        else:
            raise ValueError(f"unknown layer kind: {kind!r}")
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return variables


def flax_to_torch(variables: dict, mapping: LayerMap) -> Dict[str, np.ndarray]:
    """Export flax variables to a torch-layout state_dict (numpy values —
    pass through ``torch.from_numpy`` / ``torch.save`` to write a .pth)."""
    params = dict(variables)["params"]
    stats = dict(variables).get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}
    for tkey, fpath, kind in mapping:
        if kind == "linear":
            sd[f"{tkey}.weight"] = np.asarray(_get(params, f"{fpath}/kernel")).T
            sd[f"{tkey}.bias"] = np.asarray(_get(params, f"{fpath}/bias"))
        elif kind in ("layernorm", "batchnorm"):
            sd[f"{tkey}.weight"] = np.asarray(_get(params, f"{fpath}/scale"))
            sd[f"{tkey}.bias"] = np.asarray(_get(params, f"{fpath}/bias"))
            if kind == "batchnorm":
                sd[f"{tkey}.running_mean"] = np.asarray(_get(stats, f"{fpath}/mean"))
                sd[f"{tkey}.running_var"] = np.asarray(_get(stats, f"{fpath}/var"))
                sd[f"{tkey}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
    return sd


def generator_from_torch(state_dict: Dict) -> dict:
    return torch_to_flax(state_dict, GENERATOR_MAP)


def discriminator_from_torch(state_dict: Dict) -> dict:
    return torch_to_flax(state_dict, DISCRIMINATOR_MAP)


def forward_model_from_torch(state_dict: Dict) -> dict:
    return torch_to_flax(state_dict, FORWARD_MODEL_MAP)


# ---------------------------------------------------------------------------
# .pth file loading (reference artifact contract)
# ---------------------------------------------------------------------------

_WRAPPER_KEYS = {
    "generator": ("generator_state_dict",),
    "discriminator": ("discriminator_state_dict",),
    "forward_model": ("forward_model_state_dict",),
}


def load_torch_file(path: str):
    """torch.load a .pth on CPU (weights_only first; legacy pickle fallback
    for the reference's wrapped training checkpoints)."""
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        return torch.load(path, map_location="cpu", weights_only=False)


def extract_state_dict(obj, which: str | None = None) -> Dict:
    """Accept either a bare state_dict (the *_final.pth contract,
    train_pigan.py:301-303) or a wrapped training checkpoint
    ({'generator_state_dict': ...}, train_pigan.py:283-295); return the bare
    state_dict for `which`."""
    if not isinstance(obj, dict):
        raise TypeError(f"unsupported .pth payload: {type(obj)}")
    # a bare state_dict is non-empty and all-tensor-valued; metadata-only
    # wrappers ({'epoch': 5, ...}) and {} must fall through to the wrapper
    # key search / readable error below
    values_are_tensors = bool(obj) and all(
        hasattr(v, "shape") for v in obj.values()
    )
    if values_are_tensors:
        return obj
    for key in _WRAPPER_KEYS.get(which or "", ()) + ("model_state_dict", "state_dict"):
        if key in obj:
            return obj[key]
    raise KeyError(
        f"no state_dict for {which!r} in checkpoint with keys {sorted(obj)[:8]}"
    )


def validate_shapes(variables: dict, template: dict, name: str) -> None:
    """Loaded variables must agree leaf-for-leaf with the model template —
    catches wrong-architecture .pth files with a readable error."""
    import jax

    got = jax.tree.map(lambda x: tuple(x.shape), variables)
    want = jax.tree.map(lambda x: tuple(x.shape), template)
    if got != want:
        raise ValueError(
            f"{name}: torch checkpoint does not match the baseline "
            f"architecture.\n  loaded:   {got}\n  expected: {want}"
        )


def load_reference_models(
    directory: str,
    g_template: dict | None = None,
    d_template: dict | None = None,
    f_template: dict | None = None,
):
    """Load the reference's saved_models directory (*_final.pth trio,
    unified_evaluator.py:55-111 contract; forward_model_pretrained.pth is
    used when forward_model_final.pth is absent, mirroring :100-106).

    Returns (g_vars, d_vars, f_vars); entries are None when the file is
    missing.  Templates, when given, are shape-validated."""
    out = []
    specs = [
        ("generator_final.pth", "generator", generator_from_torch, g_template),
        ("discriminator_final.pth", "discriminator", discriminator_from_torch,
         d_template),
        ("forward_model_final.pth", "forward_model", forward_model_from_torch,
         f_template),
    ]
    for fname, which, convert, template in specs:
        path = os.path.join(directory, fname)
        if which == "forward_model" and not os.path.exists(path):
            alt = os.path.join(directory, "forward_model_pretrained.pth")
            path = alt if os.path.exists(alt) else path
        if not os.path.exists(path):
            out.append(None)
            continue
        sd = extract_state_dict(load_torch_file(path), which)
        variables = convert(sd)
        if template is not None:
            validate_shapes(variables, template, which)
        out.append(variables)
    return tuple(out)


def has_torch_artifacts(directory: str) -> bool:
    return any(
        os.path.exists(os.path.join(directory, f))
        for f in (
            "generator_final.pth", "discriminator_final.pth",
            "forward_model_final.pth", "forward_model_pretrained.pth",
        )
    )
