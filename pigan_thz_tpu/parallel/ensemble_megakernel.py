"""Multi-device megakernel seed ensembles.

The whole-epoch Pallas megakernel (ops/megakernel.py) trains one member
~2.4x faster than the XLA scan, but it is a single-device program: the
G/D/F params, Adam moments and BN stats stay VMEM-resident on one chip
for the whole epoch, so it cannot be vmapped or sharded the way the XLA
ensemble step is (parallel/ensemble.py).  Seed ensembles don't need any
of that — N members with identical (cfg, settings) but different init
seeds are embarrassingly parallel and share ONE compiled kernel program.

This driver places member i's state on device[i % D] and round-robins
the megakernel's chained (prologue, kernel) jitted calls across the
mesh: dispatch is asynchronous, so every chip trains its member(s)
concurrently with ZERO inter-chip traffic — near-linear scaling of the
flagship fast path (vs the vmapped XLA ensemble, which shards the member
axis but pays the XLA step's 2.4x).  On a single chip it degrades to the
sequential fast path, still beating the vmapped XLA sweep per member.

Reference parity anchor: the reference runs seed sweeps only as
sequential shell processes (each a full core/train/train_pigan.py run);
this module and parallel/ensemble.py are capabilities beyond it.
Ensemble-mean inference (evaluate_ensemble_mean) consumes the stacked
states this driver returns — RESULTS.md "Seed-search quality" measured
the 4-member mean beating the best individual member.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PiGanConfig
from ..data.dataset import ThzDataset
from ..models.registry import build_trio
from ..ops import megakernel as MK
from ..train.state import PiGanState, init_pigan_state, make_optimizers
from .state_utils import tree_stack


def _chunk_sizes(epochs: int, epochs_per_call: int) -> list[int]:
    """Uniform chunks of epochs_per_call plus one remainder chunk."""
    full, rem = divmod(epochs, epochs_per_call)
    return [epochs_per_call] * full + ([rem] if rem else [])


def clamp_epochs_per_call(epochs_per_call: int, spe: int) -> int:
    """Largest per-call epoch count keeping one jitted program inside the
    hardware-validated grid envelope (Trainer applies the same clamp so a
    program is always ONE launch — ops/megakernel.py _MAX_PROGRAM_GRID).

    Raises ValueError when even a single epoch exceeds the one-program
    envelope (spe_pad > _MAX_PROGRAM_GRID, ~240k samples at batch 64):
    dispatching it anyway would decompose into scanned multi-launch
    shapes, the class that corrupts on v5e (the Trainer routes those to
    the chained sub-epoch driver or XLA — trainer.py plan routing)."""
    _, _, _, spe_pad = MK._launch_plan(1, spe)
    if spe_pad > MK._MAX_PROGRAM_GRID:
        raise ValueError(
            f"dataset past the one-program megakernel envelope "
            f"(padded steps/epoch {spe_pad} > {MK._MAX_PROGRAM_GRID}); "
            "use Trainer (auto-routes to the chained sub-epoch driver "
            "or XLA) instead of the ensemble megakernel driver"
        )
    return max(1, min(epochs_per_call, MK._MAX_PROGRAM_GRID // spe_pad))


def train_seed_ensemble(
    cfg: PiGanConfig,
    ds: ThzDataset,
    num_members: int,
    *,
    settings=None,
    epochs: int | None = None,
    key: jax.Array | None = None,
    devices=None,
    epochs_per_call: int = 25,
    scales: jax.Array | None = None,
    forward_variables=None,
    interpret: bool = False,
    packed: bool = False,
    force_large_m: bool = False,
):
    """Train N independent GAN members through the Pallas megakernel,
    one member per device (round-robin when N > #devices).

    Returns ``(states, metrics)`` where ``states`` is a member-stacked
    PiGanState (leading axis N, host-gathered — feed it straight to
    parallel.ensemble.evaluate_ensemble / evaluate_ensemble_mean) and
    ``metrics`` maps each kernel metric to an (N, epochs) numpy array.

    Member i's init and per-epoch shuffle keys derive from
    ``fold_in(key, i)``, so results are bit-identical to running the same
    member alone on one device (tested in
    tests/test_ensemble_megakernel.py).
    ``forward_variables`` is the frozen pretrained F shared by every
    member (init_pigan_state deep-copies it per member).  ``scales`` is
    the optional (epochs,) constraint-annealing multiplier stream;
    default all-ones.  Raises ValueError with the envelope reason when
    (cfg, settings) is outside `supports_megakernel`.

    ``packed=True`` co-locates each device's member group in ONE kernel
    launch (ops/megakernel.make_pallas_ensemble_fn) instead of
    round-robining separate solo programs — measured ~6-10% more
    aggregate steps/s/chip when members outnumber chips (RESULTS.md
    "Member-packed kernel experiment"); results stay BIT-IDENTICAL to
    packed=False (the packed kernel consumes the exact per-member chunk
    keys this driver derives — tested).  Requires a shared
    ``forward_variables`` (the packed launch carries one frozen F) and
    ema_decay == 0.  Groups of more than 4 members per device refuse to
    compile (measured 25+ minute Mosaic compiles at M=8 — RESULTS.md
    "Member-packed kernel"); ``force_large_m=True`` overrides.
    """
    from ..train.steps import StepSettings

    if settings is None:
        settings = StepSettings.from_config(cfg)
    if epochs is None:
        epochs = cfg.train.num_epochs
    if key is None:
        key = jax.random.PRNGKey(0)
    if scales is None:
        scales = jnp.ones((epochs,), jnp.float32)
    if int(scales.shape[0]) != epochs:
        raise ValueError(f"scales must have shape ({epochs},)")
    devices = list(devices if devices is not None else jax.local_devices())
    if num_members < 1:
        raise ValueError("num_members must be >= 1")
    if epochs < 1:
        raise ValueError("epochs must be >= 1")

    B = cfg.train.batch_size
    spe = max(1, ds.num_samples // B)
    epochs_per_call = clamp_epochs_per_call(epochs_per_call, spe)
    chunks = _chunk_sizes(epochs, epochs_per_call)

    g, d, f = build_trio(cfg)
    g_tx, d_tx, _ = make_optimizers(cfg, spe)

    k_init, k_train = jax.random.split(key)
    used = [devices[i % len(devices)] for i in range(num_members)]
    if packed:
        if forward_variables is None:
            raise ValueError(
                "packed=True needs a shared forward_variables (the packed "
                "launch carries ONE frozen F for its member group)"
            )
        if float(settings.ema_decay) > 0.0:
            raise ValueError("packed=True: ema_decay > 0 unsupported")
        return _train_seed_ensemble_packed(
            cfg, ds, num_members, settings, epochs, k_init, k_train,
            devices, used, epochs_per_call, scales, forward_variables,
            interpret, g, d, f, g_tx, d_tx, spe, force_large_m,
        )
    fn = MK.make_pallas_multi_epoch_fn(cfg, settings, interpret=interpret)
    ds_by_dev = {dev: jax.device_put(ds, dev) for dev in set(used)}

    # All host->device transfers happen HERE, before the loop: each
    # per-call device_put is a blocking RPC on a remote-tunnel TPU (~0.5 s
    # measured), so the dispatch loop below touches only device-resident
    # arrays (slicing a committed array is an async device op).
    scales_by_dev = {dev: jax.device_put(scales, dev) for dev in set(used)}
    states: list[PiGanState] = []
    chunk_keys: list[jax.Array] = []
    for i, dev in enumerate(used):
        st = init_pigan_state(
            g, d, f, g_tx, d_tx, jax.random.fold_in(k_init, i),
            spectrum_dim=cfg.data.spectrum_dim, param_dim=cfg.data.param_dim,
            forward_variables=forward_variables,
            ema=float(settings.ema_decay) > 0.0,
        )
        states.append(jax.device_put(st, dev))
        chunk_keys.append(jax.device_put(
            jax.random.split(jax.random.fold_in(k_train, i), len(chunks)), dev
        ))

    # Dispatch loop: chunk-major so every member's call for chunk c is in
    # flight before any member's chunk c+1 — all devices stay busy; no
    # host sync until the final gather.
    member_metrics: list[list[dict]] = [[] for _ in range(num_members)]
    off = 0
    for c, E in enumerate(chunks):
        for i, dev in enumerate(used):
            states[i], m = fn(
                states[i],
                ds_by_dev[dev],
                chunk_keys[i][c],
                scales_by_dev[dev][off:off + E],
            )
            member_metrics[i].append(m)
        off += E

    # ONE batched host gather at the end: per-leaf device_get through the
    # remote tunnel pays a blocking RPC each (hundreds at 20 chunks x 4
    # members x 11 metrics), so concatenate per member on-device and fetch
    # states + metrics in a single device_get (async per-leaf prefetch).
    dev_metrics = [
        {k: jnp.concatenate([m[k] for m in mm]) for k in mm[0]}
        for mm in member_metrics
    ]
    host_states, host_metrics = jax.device_get((states, dev_metrics))
    metrics = {
        k: np.stack([np.asarray(hm[k]) for hm in host_metrics])   # (N, E)
        for k in host_metrics[0]
    }
    # stack the member axis host-side (members live on different devices;
    # stacking device-resident leaves would silently funnel everything
    # through the default device)
    return tree_stack(host_states), metrics


def _train_seed_ensemble_packed(
    cfg, ds, N, settings, epochs, k_init, k_train, devices, used,
    epochs_per_call, scales, forward_variables, interpret,
    g, d, f, g_tx, d_tx, spe, force_large_m=False,
):
    """packed=True implementation: each device's member group trains in
    ONE kernel launch per chunk (make_pallas_ensemble_fn).  Bit-identity
    with the unpacked driver comes from feeding the packed kernel the
    EXACT per-member chunk keys the round-robin driver derives
    (split(fold_in(k_train, i), n_chunks)[c]) via its stacked-keys path.

    `epochs_per_call` arrives already clamped by train_seed_ensemble (the
    single authoritative clamp)."""
    chunks = _chunk_sizes(epochs, epochs_per_call)
    dev_list = list(dict.fromkeys(used))
    groups = {dev: [i for i in range(N) if used[i] == dev] for dev in dev_list}
    fns = {}
    for dev in dev_list:
        Mg = len(groups[dev])
        if Mg not in fns:
            fns[Mg] = MK.make_pallas_ensemble_fn(
                cfg, settings, Mg, interpret=interpret,
                force_large_m=force_large_m,
            )
    ds_by_dev = {dev: jax.device_put(ds, dev) for dev in dev_list}
    scales_by_dev = {dev: jax.device_put(scales, dev) for dev in dev_list}
    states = {
        dev: [
            jax.device_put(
                init_pigan_state(
                    g, d, f, g_tx, d_tx, jax.random.fold_in(k_init, i),
                    spectrum_dim=cfg.data.spectrum_dim,
                    param_dim=cfg.data.param_dim,
                    forward_variables=forward_variables,
                ),
                dev,
            )
            for i in groups[dev]
        ]
        for dev in dev_list
    }
    chunk_keys = {
        dev: jax.device_put(
            jnp.stack(
                [
                    jax.random.split(
                        jax.random.fold_in(k_train, i), len(chunks)
                    )
                    for i in groups[dev]
                ],
                axis=1,
            ),
            dev,
        )  # (n_chunks, Mg, 2)
        for dev in dev_list
    }

    member_metrics: list[list[dict]] = [[] for _ in range(N)]
    off = 0
    for c, E in enumerate(chunks):
        for dev in dev_list:
            fn = fns[len(groups[dev])]
            states[dev], mlist = fn(
                states[dev], ds_by_dev[dev], chunk_keys[dev][c],
                scales_by_dev[dev][off:off + E],
            )
            for gi, i in enumerate(groups[dev]):
                member_metrics[i].append(mlist[gi])
        off += E

    dev_metrics = [
        {k: jnp.concatenate([m[k] for m in mm]) for k in mm[0]}
        for mm in member_metrics
    ]
    flat_states = [None] * N
    for dev in dev_list:
        for gi, i in enumerate(groups[dev]):
            flat_states[i] = states[dev][gi]
    host_states, host_metrics = jax.device_get((flat_states, dev_metrics))
    metrics = {
        k: np.stack([np.asarray(hm[k]) for hm in host_metrics])
        for k in host_metrics[0]
    }
    return tree_stack(host_states), metrics


def train_settings_sweep(
    cfg: PiGanConfig,
    ds: ThzDataset,
    settings_list,
    *,
    epochs: int | None = None,
    key: jax.Array | None = None,
    devices=None,
    epochs_per_call: int = 25,
    scales: jax.Array | None = None,
    forward_variables=None,
    interpret: bool = False,
):
    """Controlled A/B sweep over StepSettings through the megakernel, one
    arm per device: every arm shares the SAME init and the SAME per-epoch
    shuffle keys (derived from ``key``), so outcome differences are caused
    by the settings alone — the megakernel counterpart of the vmapped XLA
    λ-ablation (parallel/ensemble.py), at full kernel speed per arm.

    Each distinct settings compiles its own kernel program (loss weights
    are compile-time constants in the kernel — the speed contract), so
    this suits few-arm sweeps; for wide runtime-weight grids use the
    vmapped ensemble.  Arms must agree on ``ema_decay > 0`` (state
    structures must stack).  Returns ``(states, metrics_list)``: states
    is arm-stacked; metrics_list holds one {metric: (epochs,) ndarray}
    dict per arm (arms may expose different metric keys, e.g.
    constraint_loss only when constraint_w > 0).
    """
    settings_list = list(settings_list)
    if not settings_list:
        raise ValueError("settings_list must be non-empty")
    if epochs is None:
        epochs = cfg.train.num_epochs
    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    if key is None:
        key = jax.random.PRNGKey(0)
    if scales is None:
        scales = jnp.ones((epochs,), jnp.float32)
    if int(scales.shape[0]) != epochs:
        raise ValueError(f"scales must have shape ({epochs},)")
    emas = {float(s.ema_decay) > 0.0 for s in settings_list}
    if len(emas) > 1:
        raise ValueError(
            "all sweep arms must agree on ema_decay > 0 (the EMA track "
            "changes the state structure; stacked arms must match)"
        )
    devices = list(devices if devices is not None else jax.local_devices())

    B = cfg.train.batch_size
    spe = max(1, ds.num_samples // B)
    epochs_per_call = clamp_epochs_per_call(epochs_per_call, spe)
    chunks = _chunk_sizes(epochs, epochs_per_call)

    g, d, f = build_trio(cfg)
    g_tx, d_tx, _ = make_optimizers(cfg, spe)
    fns = [
        MK.make_pallas_multi_epoch_fn(cfg, s, interpret=interpret)
        for s in settings_list
    ]

    k_init, k_train = jax.random.split(key)
    n = len(settings_list)
    used = [devices[i % len(devices)] for i in range(n)]
    ds_by_dev = {dev: jax.device_put(ds, dev) for dev in set(used)}
    scales_by_dev = {dev: jax.device_put(scales, dev) for dev in set(used)}
    base_state = init_pigan_state(
        g, d, f, g_tx, d_tx, k_init,
        spectrum_dim=cfg.data.spectrum_dim, param_dim=cfg.data.param_dim,
        forward_variables=forward_variables, ema=emas.pop(),
    )
    # deep-copy per arm: device_put of the SAME host buffers to the same
    # device aliases them, and the kernel call donates its state — two
    # arms round-robined onto one device must never share buffers
    states = [
        jax.device_put(jax.tree.map(jnp.copy, base_state), dev)
        for dev in used
    ]
    shared_keys = [
        jax.device_put(jax.random.split(k_train, len(chunks)), dev)
        for dev in used
    ]

    member_metrics: list[list[dict]] = [[] for _ in range(n)]
    off = 0
    for c, E in enumerate(chunks):
        for i, dev in enumerate(used):
            states[i], m = fns[i](
                states[i], ds_by_dev[dev], shared_keys[i][c],
                scales_by_dev[dev][off:off + E],
            )
            member_metrics[i].append(m)
        off += E

    # same batched single-gather as train_seed_ensemble (tunnel RPC cost)
    dev_metrics = [
        {k: jnp.concatenate([m[k] for m in mm]) for k in mm[0]}
        for mm in member_metrics
    ]
    host_states, host_metrics = jax.device_get((states, dev_metrics))
    metrics_list = [
        {k: np.asarray(v) for k, v in hm.items()} for hm in host_metrics
    ]
    return tree_stack(host_states), metrics_list
