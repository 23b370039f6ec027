"""Compiled-program collective inspection: the multi-chip perf contract.

`dryrun_multichip` and the mesh tests prove the sharded step RUNS and the
losses are finite — but a silent fall-back to fully-replicated compute
would pass those checks while scaling at 1x.  This module inspects the
post-SPMD compiled HLO text for the collectives the sharding design must
produce (scaling-book recipe: annotate shardings, XLA inserts
collectives, VERIFY they landed):

- data-parallel gradient sync: an ``all-reduce`` whose replica groups
  span the DATA axis (e.g. {0,2,4,6},{1,3,5,7} on a (4,2) mesh);
- tensor-parallel matmul reduction: an ``all-reduce``/``reduce-scatter``
  whose groups span the MODEL axis (e.g. {0,1},{2,3},...).

XLA prints replica groups in three syntaxes; all are decoded:

- explicit: ``replica_groups={{0,1},{2,3}}``
- iota:     ``replica_groups=[4,2]<=[8]`` (reshape) and
            ``replica_groups=[2,4]<=[4,2]T(1,0)`` (transpose first)
- empty:    ``replica_groups={}`` — ONE group of all devices (the
  shorthand XLA uses for whole-world cross-replica collectives)
"""

from __future__ import annotations

import re

import numpy as np
from jax.sharding import Mesh

from .mesh import DATA_AXIS, MODEL_AXIS

_COLLECTIVES = ("all-reduce", "reduce-scatter", "all-gather", "all-to-all",
                "collective-permute")


def parse_replica_groups(attr: str) -> list[tuple[int, ...]] | None:
    """Decode one replica_groups attribute value into a list of groups."""
    attr = attr.strip().rstrip(",")
    if attr == "{}":
        return [()]  # all-devices shorthand; expanded where mesh is known
    if attr.startswith("{"):
        groups = re.findall(r"\{([\d,]+)\}", attr)
        out = [tuple(int(x) for x in g.split(",")) for g in groups]
        return out or None
    m = re.match(r"\[(\d+),(\d+)\]<=\[([\d,]+)\](?:T\(([\d,]+)\))?", attr)
    if not m:
        return None
    rows, cols = int(m.group(1)), int(m.group(2))
    src_shape = tuple(int(x) for x in m.group(3).split(","))
    ids = np.arange(int(np.prod(src_shape))).reshape(src_shape)
    if m.group(4) is not None:
        perm = tuple(int(x) for x in m.group(4).split(","))
        ids = ids.transpose(perm)
    ids = ids.reshape(rows, cols)
    return [tuple(int(x) for x in row) for row in ids]


def collective_groups(compiled_text: str) -> dict[str, list[tuple[int, ...]]]:
    """Map collective op kind -> all replica groups found in the program."""
    out: dict[str, list[tuple[int, ...]]] = {}
    for line in compiled_text.splitlines():
        kind = next((c for c in _COLLECTIVES if c in line), None)
        if kind is None:
            continue
        m = re.search(r"replica_groups=(\{\{[\d,{}]*\}\}|\{\}|\[[^ ]*)", line)
        if not m:
            continue
        groups = parse_replica_groups(m.group(1))
        if groups:
            out.setdefault(kind, []).extend(groups)
    return out


def _axis_groups(mesh: Mesh, axis: str) -> set[tuple[int, ...]]:
    """The device-id groups a collective over `axis` must use."""
    names = list(mesh.axis_names)
    ids = np.arange(mesh.devices.size).reshape(mesh.devices.shape)
    ax = names.index(axis)
    moved = np.moveaxis(ids, ax, -1).reshape(-1, mesh.shape[axis])
    return {tuple(int(x) for x in row) for row in moved}


def check_mesh_collectives(compiled_text: str, mesh: Mesh) -> dict:
    """Report which mesh axes have matching reduction collectives in the
    compiled program.  Returns {'data': bool, 'model': bool, 'groups': ...};
    an axis of size 1 is reported True (nothing to communicate)."""
    found = collective_groups(compiled_text)
    world = tuple(range(mesh.devices.size))
    reductions = [
        world if g == () else g  # () = the replica_groups={} shorthand
        for kind in ("all-reduce", "reduce-scatter")
        for g in found.get(kind, [])
    ]
    report = {"groups": found}
    for axis in (DATA_AXIS, MODEL_AXIS):
        if mesh.shape.get(axis, 1) <= 1:
            report[axis] = True
            continue
        want = _axis_groups(mesh, axis)
        got = {g for g in reductions if len(g) == mesh.shape[axis]}
        report[axis] = want.issubset(got)
    return report


def assert_mesh_collectives(compiled_text: str, mesh: Mesh) -> None:
    """Raise AssertionError when a >1-sized mesh axis has no matching
    reduction collective — the silent-replication failure mode."""
    report = check_mesh_collectives(compiled_text, mesh)
    bad = [a for a in (DATA_AXIS, MODEL_AXIS) if not report[a]]
    if bad:
        raise AssertionError(
            f"compiled program has no reduction collective over mesh "
            f"axis(es) {bad} (mesh {dict(mesh.shape)}): the sharded step "
            f"compiled to replicated compute.  Found groups: "
            f"{report['groups']}"
        )
