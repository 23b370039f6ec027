"""High-level Trainer: the UnifiedTrainer equivalent.

Covers the reference's trainer surface (core/train/unified_trainer.py:30-745):
modes ``forward_only`` / ``pigan_only`` / ``full``, per-epoch history dicts,
periodic checkpointing + resume, final-artifact saving under the contract
names, and hook points used by the multi-phase programs
(pigan_thz_tpu.train.programs).

Each epoch is ONE device program (`make_epoch_fn` lax.scan); the Python level
only sequences epochs, logs scalars, and applies metric-gated control flow —
exactly the split XLA wants.
"""

from __future__ import annotations

import math
import sys
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..config import PiGanConfig
from ..data.dataset import ThzDataset, load_or_synthesize
from ..evaluate.evaluator import Evaluator
from ..models.registry import build_trio
from ..utils.logging import RunLogger
from . import checkpoint as ckpt
from .schedules import ReduceLROnPlateau, build_optimizer
from .state import (
    ForwardState,
    PiGanState,
    init_forward_state,
    init_pigan_state,
    make_optimizers,
)
from .steps import (
    ForwardStepSettings,
    StepSettings,
    make_forward_step,
    make_multi_epoch_fn,
    make_pigan_step,
)

History = Dict[str, List[float]]

# Shadow-parity tolerances (first-epoch metric rows, megakernel vs the XLA
# replay of the SAME chunk from the SAME state and rng).  On clean hardware
# the two backends differ only by fp reassociation over one epoch's steps
# (measured ~1e-3 relative); the round-3d finite-but-wrong miscompile was
# ~10x off.  The forward kernel's in-kernel dropout uses the TPU hardware
# PRNG (same distribution, different bitstream than the XLA path), so its
# first-epoch loss additionally carries mask noise — hence the looser rtol
# when dropout is active.
_SHADOW_RTOL = 0.25
_SHADOW_RTOL_DROPOUT = 0.5
_SHADOW_ATOL = 1e-2


def _rows_host(ms) -> dict:
    """Metric pytree -> {key: [per-epoch floats]} via ONE device_get.
    Iterating a device array element-by-element pays one blocking RPC per
    (epoch, metric) through the TPU tunnel (round-3e lesson: pre-fetch
    everything in one transfer)."""
    host = jax.device_get(ms)
    return {k: [float(x) for x in v] for k, v in host.items()}


class Trainer:
    def __init__(
        self,
        cfg: PiGanConfig,
        ds: Optional[ThzDataset] = None,
        logger: Optional[RunLogger] = None,
        csv_path: Optional[str] = None,
        epochs_per_call: int = 25,
        mesh=None,
        nan_guard: bool = True,
        megakernel: str = "auto",
        shadow_parity: str = "every:20",
    ):
        # epochs_per_call > 1 scans whole epochs inside one jit call
        # (make_multi_epoch_fn): fewer dispatches, chunk-granular snapshots.
        # mesh: optional jax.sharding.Mesh -> data-parallel batches +
        # tensor-parallel wide kernels (parallel/sharding.py rules).
        # megakernel: "auto" uses the VMEM-resident Pallas whole-epoch
        # kernel (ops/megakernel.py, measured 2.5x the XLA step on v5e-1)
        # whenever on TPU + the baseline trio + in-envelope settings (since
        # round 3 that includes the program-phase knobs: constraint loss +
        # annealing, d_update_every, cycle consistency, sigmoid squash,
        # per-phase optimizer overrides); "off" forces the XLA path;
        # "force" demands the kernel (interpreted off-TPU — tests) and
        # raises where unsupported.
        self.cfg = cfg
        self.ds = ds if ds is not None else load_or_synthesize(cfg.data, csv_path)
        if self.ds.spectrum_dim != cfg.data.spectrum_dim:
            # a CSV with a different Freq_* column count adapts the whole
            # config, so models are built against the real spectrum width
            import dataclasses as _dc

            cfg = cfg.replace(
                data=_dc.replace(cfg.data, spectrum_dim=self.ds.spectrum_dim)
            )
            self.cfg = cfg
        self.logger = logger
        self.generator, self.discriminator, self.forward_model = build_trio(cfg)
        self.steps_per_epoch = max(1, self.ds.num_samples // cfg.train.batch_size)
        self.g_tx, self.d_tx, self.f_tx = make_optimizers(cfg, self.steps_per_epoch)

        self.forward_state: Optional[ForwardState] = None
        self.pigan_state: Optional[PiGanState] = None
        self.train_history: History = {}
        self.epochs_per_call = max(1, epochs_per_call)
        self.nan_guard = nan_guard  # fail fast on divergence (SURVEY §5:
        # the reference only checks NaN inside one constraint loss)
        assert megakernel in ("auto", "off", "force"), megakernel
        self.megakernel = megakernel
        # shadow_parity guards the megakernel against FINITE-but-wrong
        # corruption (the round-3d class, invisible to the non-finite net):
        # "first" replays the first megakernel chunk of each kind on the
        # XLA path from the same state/rng and compares the first epoch's
        # metric row (_SHADOW_RTOL); "all" replays every chunk (probes);
        # "every:N" (the default, N=20) replays chunk 0 of each kind and
        # every Nth after — the periodic cadence covers corruption classes
        # that appear only in later program shapes (scanned launches,
        # resume tails — round-3 history), and its replays cover ONE epoch
        # only (split(key, 1)[0] == split(key, E)[0], so the first-epoch
        # comparison row is bitwise the full replay's; measured overhead
        # ~2.4 XLA-epochs per N*E kernel-epochs, <0.5% at the defaults);
        # "off" disables.  A mismatch counts as a fallback trip: the run
        # continues from the XLA result with the kernel disabled.
        self._shadow_every: Optional[int] = None
        if shadow_parity.startswith("every:"):
            n = int(shadow_parity.split(":", 1)[1])
            if n < 1:
                raise ValueError(f"shadow_parity {shadow_parity!r}: N >= 1")
            self._shadow_every = n
        else:
            assert shadow_parity in ("off", "first", "all"), shadow_parity
        self.shadow_parity = shadow_parity
        self._shadow_counts: dict = {}  # per-kind chunk counter (every:N)
        self._shadow_done: set = set()
        self._shadow_result = None  # (state, rows) of the last XLA replay
        self.shadow_checks: List[dict] = []  # one record per replay
        self.fallback_trips = 0  # megakernel->XLA reliability-net trips
        self.fallback_events: List[str] = []  # one "<what>@epoch<N>" per trip
        self._progress_anchors: dict = {}  # per-kind post-compile window
        self._progress_warm: set = set()   # kinds whose program is compiled
        self.mesh = mesh
        if mesh is not None:
            from ..parallel.sharding import replicate_dataset

            self.ds = replicate_dataset(self.ds, mesh)
        # cache of jit-wrapped multi-epoch fns keyed by (kind, settings,
        # optimizer overrides) — re-running a phase with identical settings
        # (e.g. repeated program phases) reuses the traced/compiled program
        self._epoch_fns: dict = {}

    def _make_multi_epoch(self, step_fn, with_scale: bool, cache_key=None):
        if cache_key is not None and cache_key in self._epoch_fns:
            return self._epoch_fns[cache_key]
        if self.mesh is not None:
            from ..parallel.sharding import make_parallel_multi_epoch_fn

            fn = make_parallel_multi_epoch_fn(
                step_fn, self.cfg.train.batch_size, self.mesh, with_scale=with_scale
            )
        else:
            fn = make_multi_epoch_fn(
                step_fn, self.cfg.train.batch_size, with_scale=with_scale
            )
        if cache_key is not None:
            self._epoch_fns[cache_key] = fn
        return fn

    def _maybe_megakernel(self, settings, override_key):
        """The Pallas whole-epoch kernel when eligible, else None (XLA path).

        Eligibility: megakernel enabled, single-chip (no mesh), and the
        (model, settings) envelope of ops.megakernel.supports_megakernel.
        Per-phase optimizer overrides (lr_g/lr_d/schedule_g/schedule_d) are
        forwarded to the kernel builder, which precomputes the overridden
        schedules over the phase horizon (round 3)."""
        if self.megakernel == "off" or self.mesh is not None:
            if self.megakernel == "force" and self.mesh is not None:
                raise ValueError("megakernel='force' is incompatible with mesh")
            return None
        from ..ops.megakernel import (
            make_pallas_multi_epoch_fn,
            supports_megakernel,
        )

        # every dataset size is in-envelope: large spe decomposes each
        # epoch into uniform sub-epoch launches, divisor-less spe (e.g.
        # prime) pads each epoch with gated no-op steps (ops/megakernel.py
        # _launch_plan), and datasets past even the ONE-epoch-per-program
        # scale run each epoch as chained single-launch jitted calls
        # (make_pallas_subepoch_fn — the forward driver's proven design)
        reason = supports_megakernel(self.cfg, settings)
        use_sub = False
        if reason is None:
            from ..ops.megakernel import (
                _launch_plan,
                _MAX_PROGRAM_GRID,
                supports_gan_subepoch,
            )

            spe_pad = _launch_plan(2, self.steps_per_epoch)[3]
            if spe_pad > _MAX_PROGRAM_GRID:
                # even a one-epoch call would exceed the proven per-program
                # grid scale (_mega_gan_chunk_cap can't clamp below E=1):
                # chained sub-epoch driver, with its tighter envelope
                sub_reason = supports_gan_subepoch(settings)
                if sub_reason is not None:
                    reason = (
                        f"dataset past the one-program envelope "
                        f"({spe_pad} > {_MAX_PROGRAM_GRID}) and {sub_reason}"
                    )
                else:
                    use_sub = True
        on_tpu = jax.default_backend() == "tpu"
        if reason is not None or (self.megakernel == "auto" and not on_tpu):
            if self.megakernel == "force" and reason is not None:
                raise ValueError(f"megakernel='force' but: {reason}")
            return None
        cache_key = ("gan-mega-sub" if use_sub else "gan-mega",
                     settings, override_key)
        if cache_key not in self._epoch_fns:
            self._log_always(
                "megakernel engaged: VMEM-resident Pallas epoch kernel"
                + (" (chained sub-epoch driver)" if use_sub else "")
            )
            kwargs = {}
            if override_key:
                # per-phase optimizer policy: same knobs train_pigan used to
                # rebuild the optax chain (the overridden optimizer's Adam
                # state is re-initialized there; the kernel reads counts
                # from the state, so the two stay in lockstep)
                lr_g, lr_d, schedule_g, schedule_d, epochs = override_key
                kwargs = dict(
                    lr_g=lr_g, lr_d=lr_d, schedule_g=schedule_g,
                    schedule_d=schedule_d, horizon_epochs=epochs,
                )
            if use_sub:
                from ..ops.megakernel import make_pallas_subepoch_fn

                factory = make_pallas_subepoch_fn
            else:
                factory = make_pallas_multi_epoch_fn
            self._epoch_fns[cache_key] = factory(
                self.cfg, settings, interpret=not on_tpu, **kwargs
            )
        return self._epoch_fns[cache_key]

    def _mega_gan_chunk_cap(self, chunk: int) -> int:
        """Per-call epoch cap for the GAN megakernel path (reliability
        envelope, ops/megakernel.py cap notes): keep each jitted
        program's grid total within _MAX_PROGRAM_GRID (the proven
        scanned-launch scale) counting the GATED per-epoch grid size
        spe_pad (= spe unless a divisor-less spe pads each epoch with
        no-op steps); this also bounds the per-call HBM stream footprint
        for large datasets."""
        from ..ops.megakernel import _launch_plan, _MAX_PROGRAM_GRID

        # E=2 probes the plan past the trivial E=1 case: for spe <=
        # _MAX_GRID/2 it stays in the (unpadded) single-launch branch and
        # spe_pad == spe; only when 2*spe exceeds _MAX_GRID can the plan
        # return a GATED spe_pad > spe, which is the size the per-program
        # budget must count
        spe_pad = _launch_plan(2, self.steps_per_epoch)[3]
        return min(chunk, max(1, _MAX_PROGRAM_GRID // spe_pad))

    def _maybe_forward_megakernel(self, settings, lr, epochs, schedule="cosine"):
        """Pallas forward-pretrain kernel when eligible, else None.  Note
        the in-kernel dropout masks come from the TPU hardware PRNG — same
        distribution as the XLA path, different bitstream."""
        if self.megakernel == "off" or self.mesh is not None:
            if self.megakernel == "force" and self.mesh is not None:
                # mirror _maybe_megakernel's 'force' semantics: never
                # silently downgrade a forced run to the XLA path
                raise ValueError("megakernel='force' is incompatible with mesh")
            return None
        from ..ops import megakernel as megakernel_mod
        from ..ops.megakernel import (
            _FWD_MAX_TOTAL,
            make_pallas_forward_epoch_fn,
            make_pallas_forward_subepoch_fn,
            supports_forward_megakernel,
        )

        reason = supports_forward_megakernel(self.cfg)
        # the forward kernel's per-PROGRAM grid bound (tighter than the
        # GAN kernel's per-launch cap; _FWD_MAX_TOTAL note): large
        # datasets drive each epoch as chained sub-epoch jitted calls
        # (round 3); divisor-less spe pads the tail call with gated
        # no-op steps (_fwd_sub_plan), so every dataset size is eligible
        sub = reason is None and self.steps_per_epoch > _FWD_MAX_TOTAL
        on_tpu = jax.default_backend() == "tpu"
        if reason is None and not on_tpu and self.cfg.forward_model.dropout_rate > 0:
            # interpret mode has no TPU PRNG for the dropout masks
            reason = "dropout needs the hardware PRNG (TPU only)"
        if (
            sub and on_tpu and self.megakernel == "auto"
            and not megakernel_mod._FWD_SUB_AUTO_OK
        ):
            # off-switch: _FWD_SUB_AUTO_OK=False keeps large datasets on
            # XLA in auto mode (the round-3 pre-root-cause behavior; the
            # split-prologue driver is hardware-proven clean — RESULTS.md).
            # megakernel='force' still drives the kernel either way.
            reason = (
                "forward sub-epoch driver disabled for auto mode "
                "(_FWD_SUB_AUTO_OK=False)"
            )
        if reason is not None or (self.megakernel == "auto" and not on_tpu):
            if self.megakernel == "force" and reason is not None:
                raise ValueError(f"megakernel='force' but: {reason}")
            return None
        cache_key = (
            "fwd-mega", settings, lr, epochs if lr is not None else None,
            schedule,
        )
        if cache_key not in self._epoch_fns:
            self._log_always("megakernel engaged for forward pretrain")
            factory = (
                make_pallas_forward_subepoch_fn if sub
                else make_pallas_forward_epoch_fn
            )
            self._epoch_fns[cache_key] = factory(
                self.cfg, settings,
                lr=lr, total_epochs=epochs if lr is not None else None,
                interpret=not on_tpu, schedule=schedule,
            )
        return self._epoch_fns[cache_key]

    @staticmethod
    def _state_finite(state) -> bool:
        """One-fetch probe: True iff every float leaf of the train state is
        finite.  Guards the megakernel fallback net against corruption that
        leaves the METRICS finite but poisons params/moments (the metric
        lanes and the state buffers travel separately)."""
        total = jnp.zeros((), jnp.float32)
        for x in jax.tree.leaves(state):
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
                total = total + jnp.sum(x).astype(jnp.float32)
        return math.isfinite(float(total))

    def _plan_small_grid_routes(self, epochs: int, forward: bool) -> set:
        """Chunk start-epochs whose megakernel program would fall in the
        v5e small-grid miscompile class (ops/megakernel.py _MIN_CLEAN_GRID:
        pack=1 launch under 120 grid steps with no step-pack divisor).
        Such chunks are PLANNED onto the XLA path — a route, not a
        fallback trip.  Under megakernel='force' any planned route raises
        up-front (before any training) so a forced run never silently
        leaves the kernel mid-run."""
        from ..ops.megakernel import small_grid_risk, small_grid_risk_forward

        risk_fn = small_grid_risk_forward if forward else small_grid_risk
        routes, epoch = {}, 0
        while epoch < epochs:
            chunk = min(self.epochs_per_call, epochs - epoch)
            if forward:
                from ..ops.megakernel import _FWD_MAX_TOTAL

                chunk = min(chunk, max(1, _FWD_MAX_TOTAL // self.steps_per_epoch))
            else:
                chunk = self._mega_gan_chunk_cap(chunk)
            reason = risk_fn(chunk, self.steps_per_epoch)
            if reason is not None:
                routes[epoch] = reason
            epoch += chunk
        if routes and self.megakernel == "force":
            what = "forward" if forward else "pigan"
            raise ValueError(
                f"megakernel='force' but {len(routes)} {what} chunk(s) "
                f"would compile in the v5e small-grid miscompile class "
                f"(first: epoch {min(routes)}: {routes[min(routes)]}); "
                "pick an epoch count whose tail chunk packs (or >= "
                "8 epochs), or use megakernel='auto' to route those "
                "chunks onto the XLA path"
            )
        return set(routes)

    def _chunk_with_fallback(
        self, multi_epoch, mega_active, xla_factory, state, sub, scales, what,
        at: int = -1,
    ):
        """Run one multi-epoch chunk; if the megakernel produced non-finite
        metrics OR a non-finite state, restore the pre-chunk state and rerun
        on the XLA path (Mosaic reliability net — ops/megakernel.py
        _MAX_GRID note).  A genuinely diverging run reproduces the
        non-finite metrics on the retry and surfaces through the normal NaN
        guard.

        Returns (new_state, rows, multi_epoch, mega_active)."""
        backup = jax.tree.map(jnp.copy, state) if mega_active else None
        new_state, ms = multi_epoch(state, self.ds, sub, scales)
        rows = _rows_host(ms)
        if mega_active and not (
            all(math.isfinite(x) for v in rows.values() for x in v)
            and self._state_finite(new_state)
        ):
            self._log_always(
                f"{what} megakernel chunk at epoch {at} produced non-finite "
                "metrics or state; retrying on the XLA path (megakernel "
                "disabled for the rest of this run)"
            )
            self.fallback_trips += 1
            self.fallback_events.append(f"{what}@epoch{at}")
            multi_epoch = xla_factory()
            mega_active = False
            new_state, ms = multi_epoch(backup, self.ds, sub, scales)
            rows = _rows_host(ms)
        elif mega_active and self._shadow_due(what):
            ok, report = self._shadow_replay(
                xla_factory, backup, sub, scales, rows, what, at
            )
            if not ok:
                self._log_always(
                    f"{what} megakernel chunk at epoch {at} FAILED shadow "
                    f"parity vs the XLA replay ({report}); continuing from "
                    "the XLA result (megakernel disabled for the rest of "
                    "this run)"
                )
                self.fallback_trips += 1
                self.fallback_events.append(f"{what}-shadow@epoch{at}")
                multi_epoch = xla_factory()
                mega_active = False
                if self._shadow_result is not None:
                    new_state, rows = self._shadow_result
                else:
                    # every:N replays cover one epoch only — recompute the
                    # full chunk on the XLA path from the pre-chunk state
                    new_state, ms = multi_epoch(backup, self.ds, sub, scales)
                    rows = _rows_host(ms)
            self._shadow_result = None
        return new_state, rows, multi_epoch, mega_active

    def _shadow_due(self, what: str) -> bool:
        if self.shadow_parity == "off":
            return False
        if self._shadow_every is not None:
            c = self._shadow_counts.get(what, 0)
            self._shadow_counts[what] = c + 1
            return c % self._shadow_every == 0
        return self.shadow_parity == "all" or what not in self._shadow_done

    def _shadow_replay(self, xla_factory, backup, sub, scales, rows, what, at):
        """Replay the just-completed megakernel chunk on the XLA path from
        the pre-chunk state (same rng key, bitwise-equal noise streams) and
        compare the FIRST epoch's metric row — one epoch from an identical
        state isolates per-step corruption from chaotic trajectory
        divergence.  Catches the finite-but-wrong miscompile class the
        non-finite net cannot see (RESULTS.md Round-3d: the forward kernel's
        first-epoch loss was ~10x the XLA value; clean hardware matches to
        ~1e-3).  Returns (ok, report) and stashes the replay's
        (state, rows) in self._shadow_result for the trip path."""
        self._shadow_done.add(what)
        xla_fn = xla_factory()
        # every:N cadence replays ONE epoch only: the comparison uses the
        # first epoch's metric row, and split(key, 1)[0] == split(key, E)[0]
        # makes that row bitwise the full replay's — the periodic check
        # costs ~1 XLA epoch per N*E kernel epochs.  The trip path then
        # recomputes the full chunk (_shadow_result stays None).
        partial = self._shadow_every is not None and int(scales.shape[0]) > 1
        # the XLA fn donates its state arg — a partial replay must not
        # consume `backup` (the trip path recomputes the full chunk from it)
        shadow_state, sms = xla_fn(
            jax.tree.map(jnp.copy, backup) if partial else backup,
            self.ds, sub, scales[:1] if partial else scales,
        )
        srows = _rows_host(sms)
        self._shadow_result = None if partial else (shadow_state, srows)
        rtol = _SHADOW_RTOL
        if what == "forward" and self.cfg.forward_model.dropout_rate > 0:
            rtol = _SHADOW_RTOL_DROPOUT  # hardware-PRNG dropout mask noise
        bad, worst_key, worst_rel = [], None, 0.0
        for k in rows:
            if k not in srows:
                bad.append(f"{k}: missing in replay")
                continue
            a, b = rows[k][0], srows[k][0]
            # kernel rows are finite here (the non-finite net ran first);
            # a NaN/inf REPLAY row is a red-alert divergence that must
            # fail, not slip through a NaN comparison (NaN > x is False)
            if not math.isfinite(b):
                bad.append(f"{k}: {a:.6g} vs {b:.6g} (replay non-finite)")
                worst_key, worst_rel = k, float("inf")
                continue
            denom = max(abs(a), abs(b))
            rel = abs(a - b) / denom if denom > 0 else 0.0
            if abs(a - b) > _SHADOW_ATOL + rtol * denom:
                bad.append(f"{k}: {a:.6g} vs {b:.6g}")
            if rel > worst_rel:
                worst_key, worst_rel = k, rel
        record = dict(
            what=what, at=at, ok=not bad, rtol=rtol,
            worst_key=worst_key, worst_rel=worst_rel,
        )
        self.shadow_checks.append(record)
        if bad:
            return False, "; ".join(bad)
        self._log_always(
            f"{what} megakernel shadow parity ok at epoch {at} "
            f"(worst {worst_key} rel diff {worst_rel:.2e})"
        )
        return True, ""

    def _maybe_shard(self, state):
        if self.mesh is not None:
            from ..parallel.sharding import shard_state

            return shard_state(state, self.mesh)
        return state

    # ------------------------------------------------------------------
    def _log(self, msg: str) -> None:
        if self.logger:
            self.logger.info(msg)

    def _log_always(self, msg: str) -> None:
        """Reliability events (megakernel engagement / fallback trips) must
        never be silent: loggerless Trainers report them to stderr."""
        if self.logger:
            self.logger.info(msg)
        else:
            print(f"[trainer] {msg}", file=sys.stderr)

    def _progress(self, what: str, t_start: float, done_epochs: int,
                  total_epochs: int, program_key=None) -> None:
        """Per-chunk steps/s + ETA line — the chunked-jit counterpart of the
        reference's in-epoch progress bar with ETA (train_pigan.py:205-233;
        an in-epoch bar is meaningless when 25 epochs run per jit call).

        The first chunk's window includes jit compilation (minutes through
        a remote tunnel), which would deflate a cumulative rate for the
        whole run — so the first line is labeled and later lines rebase
        their window to post-compile time."""
        dt = time.time() - t_start
        if dt <= 0 or done_epochs <= 0:
            return
        anchor = self._progress_anchors.get(what)
        if anchor is not None and anchor[0] >= t_start and done_epochs > anchor[1]:
            rate = (done_epochs - anchor[1]) * self.steps_per_epoch / (
                time.time() - anchor[0])
            note = ""
        else:  # first chunk of this run
            self._progress_anchors[what] = (time.time(), done_epochs)
            rate = done_epochs * self.steps_per_epoch / dt
            # a later train() call reusing the SAME jitted program is warm
            # — but a new lr/schedule/settings combo compiles fresh, so
            # the warm set keys on the program identity, not the kind
            warm_key = (what, program_key)
            note = " (incl. compile)" if warm_key not in self._progress_warm else ""
            self._progress_warm.add(warm_key)
        left = (total_epochs - done_epochs) * self.steps_per_epoch / rate
        eta = f"{int(left // 60)}:{int(left % 60):02d}"
        self._log(
            f"[{what}] epoch {done_epochs}/{total_epochs} "
            f"{rate:,.0f} steps/s{note}, ETA {eta}"
        )

    def _record(self, metrics: Dict[str, jax.Array], prefix: str, epoch: int) -> None:
        for k, v in metrics.items():
            val = float(v)
            if self.nan_guard and not math.isfinite(val):
                raise FloatingPointError(
                    f"non-finite {prefix}{k} at epoch {epoch} — training "
                    "diverged (disable with Trainer(nan_guard=False))"
                )
            self.train_history.setdefault(f"{prefix}{k}", []).append(val)
        if self.logger:
            self.logger.add_scalars(
                {k: float(v) for k, v in metrics.items()}, epoch, prefix
            )

    # ------------------------------------------------------------------
    # Forward surrogate training (pretrain_fwd_model.py / phase-1 / emergency)
    # ------------------------------------------------------------------
    def pretrain_forward(
        self,
        epochs: Optional[int] = None,
        settings: ForwardStepSettings = ForwardStepSettings(),
        lr: Optional[float] = None,
        seed: int = 0,
        log_every: int = 10,
        early_stop_patience: Optional[int] = None,
        keep_best: bool = False,
        reset: bool = False,
        checkpoint_manager: Optional[ckpt.CheckpointManager] = None,
        schedule: str = "cosine",
        plateau: Optional["ReduceLROnPlateau"] = None,
    ) -> History:
        """``plateau`` attaches a host-side metric-reactive LR controller
        (schedules.ReduceLROnPlateau — emergency_trainer.py:131-133 parity):
        it observes each epoch's total loss and its scale multiplies the
        compiled LR schedule from the NEXT chunk on (both backends consume
        the per-epoch scale stream).  The controller is caller-owned state:
        with a ``checkpoint_manager`` its state_dict rides in the
        checkpoint meta (``extra['plateau']``) and a resuming caller
        restores it via ``plateau.load_state_dict`` before re-calling.
        ``schedule`` picks the base schedule for an ``lr`` override
        (the reference's emergency phase pairs a CONSTANT base LR with the
        plateau controller)."""
        cfg = self.cfg
        # NOTE explicit None check: epochs=0 legitimately means
        # "initialize state only" (used by resumable pipelines)
        epochs = cfg.train.fwd_pretrain_epochs if epochs is None else epochs
        if schedule != "cosine" and lr is None:
            raise ValueError(
                "schedule= only applies to an lr override (without lr the "
                "optimizer comes from the config's fwd_pretrain settings)"
            )
        tx = self.f_tx
        if lr is not None:
            tx = build_optimizer(
                lr=lr, total_epochs=epochs, steps_per_epoch=self.steps_per_epoch,
                schedule=schedule, b1=0.9, grad_clip=cfg.train.grad_clip,
                schedule_alpha=0.0,
                adam_state_dtype=cfg.train.adam_state_dtype,
            )
        if self.forward_state is None or reset:
            self.forward_state = self._maybe_shard(
                init_forward_state(
                    self.forward_model, tx, jax.random.PRNGKey(cfg.train.seed + seed),
                    param_dim=cfg.data.param_dim,
                )
            )
        elif lr is not None:
            # fresh optimizer state for the new LR/schedule: the override's
            # cosine horizon is `epochs`, so resuming the old Adam count
            # would start the schedule mid-decay (or clamped at zero)
            self.forward_state = self.forward_state.replace(
                opt=tx.init(self.forward_state.f.params)
            )
        multi_epoch = self._maybe_forward_megakernel(settings, lr, epochs, schedule)
        mega_active = multi_epoch is not None

        def _xla_epoch_fn():
            # with_scale=True threads the per-epoch LR-scale stream into
            # the step (exact no-op at scale 1.0 — IEEE multiply by 1.0)
            return self._make_multi_epoch(
                make_forward_step(self.forward_model, tx, settings),
                with_scale=True,
                cache_key=("fwd", settings, lr,
                           epochs if lr is not None else None, schedule),
            )

        if multi_epoch is None:
            multi_epoch = _xla_epoch_fn()

        if (
            plateau is not None
            and checkpoint_manager is not None
            and math.isinf(plateau.best)
            and plateau.num_bad_epochs == 0
        ):
            # kill/resume: a PRISTINE controller paired with a manager that
            # has saved plateau state resumes from it — otherwise the
            # restart silently forgets the reductions and retrains at the
            # pre-plateau LR.  A caller-warmed controller is left alone.
            latest = checkpoint_manager.latest_epoch()
            if latest is not None:
                _, _, meta = checkpoint_manager.restore_with_meta(
                    self.forward_state, latest
                )
                saved = (meta or {}).get("extra", {}).get("plateau")
                if saved:
                    plateau.load_state_dict(saved)
                    self._log(
                        f"[forward] plateau controller resumed from "
                        f"checkpoint {latest} (scale {plateau.scale:g})"
                    )

        best_loss, best_state, bad_epochs = float("inf"), None, 0
        key = jax.random.PRNGKey(cfg.train.seed + 1000 + seed)
        epoch = 0
        stop = False
        # checkpoint steps must be globally monotonic across repeated
        # chunk-resumable calls: base them on epochs already in history
        ckpt_base = len(self.train_history.get("forward/loss", []))
        t_start = time.time()
        xla_routes = (
            self._plan_small_grid_routes(epochs, forward=True)
            if mega_active and not getattr(multi_epoch, "sub_epoch", False)
            else set()
        )
        while epoch < epochs and not stop:
            chunk = min(self.epochs_per_call, epochs - epoch)
            if mega_active and not getattr(multi_epoch, "sub_epoch", False):
                # forward kernel: one launch per jitted program, total grid
                # <= _FWD_MAX_TOTAL (the hardware-proven single-launch
                # program size — megakernel.py bound notes); chained
                # separate calls cover longer horizons.  The sub-epoch
                # driver enforces the bound internally.
                from ..ops.megakernel import _FWD_MAX_TOTAL

                chunk = min(
                    chunk, max(1, _FWD_MAX_TOTAL // self.steps_per_epoch)
                )
            key, sub = jax.random.split(key)
            routed = mega_active and epoch in xla_routes
            if routed:
                # planned route (small-grid miscompile class), NOT a trip
                self._log_always(
                    f"forward chunk at epoch {epoch} ({chunk} epochs) "
                    "planned onto the XLA path (v5e small-grid envelope)"
                )
            fn, active = (_xla_epoch_fn(), False) if routed \
                else (multi_epoch, mega_active)
            # plateau scale is chunk-granular: the controller's latest
            # scale applies to every epoch of the NEXT chunk
            lr_scale = plateau.scale if plateau is not None else 1.0
            self.forward_state, rows, fn, active = self._chunk_with_fallback(
                fn, active, _xla_epoch_fn, self.forward_state, sub,
                jnp.full((chunk,), lr_scale, jnp.float32), "forward", at=epoch,
            )
            if not routed:
                multi_epoch, mega_active = fn, active
            improved_in_chunk = False
            for j in range(chunk):
                e = epoch + j
                m = {k: v[j] for k, v in rows.items()}
                if plateau is not None:
                    before = plateau.num_reductions
                    plateau.step(m["loss"])
                    if plateau.num_reductions != before:
                        self._log(
                            f"[forward] plateau: LR scale -> "
                            f"{plateau.scale:g} at epoch {e + 1} "
                            "(applies next chunk)"
                        )
                    m = dict(m, lr_scale=lr_scale)
                self._record(m, "forward/", e)
                if (e + 1) % log_every == 0:
                    self._log(f"[forward] epoch {e + 1}/{epochs} loss={m['loss']:.6f}")
                if m["loss"] < best_loss - 1e-7:
                    best_loss, bad_epochs = m["loss"], 0
                    improved_in_chunk = True
                else:
                    bad_epochs += 1
                    if early_stop_patience and bad_epochs >= early_stop_patience:
                        self._log(f"[forward] early stop at epoch {e + 1}")
                        stop = True
                        break
            if keep_best and improved_in_chunk:
                # snapshot at chunk granularity (copy: next call donates)
                best_state = jax.tree.map(jnp.copy, self.forward_state)
            if checkpoint_manager is not None:
                checkpoint_manager.maybe_save(
                    ckpt_base + epoch + chunk, self.forward_state,
                    history=self.train_history, config=self.cfg,
                    extra=(
                        {"plateau": plateau.state_dict()}
                        if plateau is not None else None
                    ),
                )
            epoch += chunk
            self._progress(
                "forward", t_start, epoch, epochs,
                program_key=(settings, lr,
                             epochs if lr is not None else None, schedule),
            )
        if keep_best and best_state is not None:
            self.forward_state = best_state
        return self.train_history

    # ------------------------------------------------------------------
    # PI-GAN training (train_pigan.py / trainer-variant settings)
    # ------------------------------------------------------------------
    def init_pigan(self, seed: int = 0, fresh_gd: bool = False) -> PiGanState:
        fwd_vars = (
            self.forward_state.f.variables if self.forward_state is not None else None
        )
        if self.pigan_state is None or fresh_gd:
            self.pigan_state = self._maybe_shard(
                init_pigan_state(
                    self.generator, self.discriminator, self.forward_model,
                    self.g_tx, self.d_tx,
                    jax.random.PRNGKey(self.cfg.train.seed + 2000 + seed),
                    spectrum_dim=self.ds.spectrum_dim,
                    param_dim=self.cfg.data.param_dim,
                    forward_variables=fwd_vars,
                )
            )
        elif fwd_vars is not None:
            # refresh frozen F with latest pretrained weights (copied: the
            # GAN epoch loop donates its state, which would invalidate
            # buffers shared with forward_state)
            from .state import ModelState

            self.pigan_state = self.pigan_state.replace(
                f=ModelState.from_variables(jax.tree.map(jnp.copy, fwd_vars))
            )
        return self.pigan_state

    def train_pigan(
        self,
        epochs: Optional[int] = None,
        settings: Optional[StepSettings] = None,
        log_every: int = 10,
        constraint_schedule: Optional[Callable[[int], float]] = None,
        snapshot_metric: Optional[str] = None,
        snapshot_mode: str = "min",
        early_stop: Optional[Callable[[Dict[str, float]], bool]] = None,
        checkpoint_manager: Optional[ckpt.CheckpointManager] = None,
        lr_g: Optional[float] = None,
        lr_d: Optional[float] = None,
        schedule_g: Optional[str] = None,
        schedule_d: Optional[str] = None,
        seed: int = 0,
    ) -> History:
        """Run GAN epochs with optional constraint annealing
        (unified_constraint_trainer.py:515-529), best-snapshot restore
        (:645-674), metric-based early stop (:662-665), and per-phase
        optimizer policy overrides — the constraint trainer's per-mode
        LR + Cosine/Linear/Step scheduler pairings (:196-214).  Overriding
        an optimizer resets its Adam moments (a fresh phase, matching the
        reference's re-created optimizers per mode).

        NOTE the LR-schedule horizon comes from ``cfg.train.num_epochs``
        (set at Trainer construction), NOT from this call's ``epochs`` —
        chunk-resumable callers invoke this repeatedly and the horizon must
        span the TOTAL budget.  For long runs set
        ``train.num_epochs=<total>`` in the config (the CLI does this from
        ``--epochs``); a mismatched horizon silently costs quality
        (measured -0.015 param R2; RESULTS.md "Seed-search")."""
        cfg = self.cfg
        epochs = cfg.train.num_epochs if epochs is None else epochs
        settings = settings or StepSettings.from_config(cfg)
        if self.pigan_state is None:
            self.init_pigan()
        if settings.ema_decay > 0.0 and self.pigan_state.g_ema is None:
            # seed the EMA track at the current generator params
            self.pigan_state = self._maybe_shard(
                self.pigan_state.replace(
                    g_ema=jax.tree.map(jnp.copy, self.pigan_state.g.params)
                )
            )

        g_tx, d_tx = self.g_tx, self.d_tx
        if lr_g is not None or schedule_g is not None:
            g_tx = build_optimizer(
                lr=lr_g if lr_g is not None else cfg.train.lr_g,
                total_epochs=epochs, steps_per_epoch=self.steps_per_epoch,
                schedule=schedule_g or "cosine", b1=0.5,
                grad_clip=cfg.train.grad_clip,
                adam_state_dtype=cfg.train.adam_state_dtype,
            )
            self.pigan_state = self.pigan_state.replace(
                g_opt=g_tx.init(self.pigan_state.g.params)
            )
        if lr_d is not None or schedule_d is not None:
            d_tx = build_optimizer(
                lr=lr_d if lr_d is not None else cfg.train.lr_d,
                total_epochs=epochs, steps_per_epoch=self.steps_per_epoch,
                schedule=schedule_d or "step", b1=0.5,
                grad_clip=cfg.train.grad_clip,
                adam_state_dtype=cfg.train.adam_state_dtype,
            )
            self.pigan_state = self.pigan_state.replace(
                d_opt=d_tx.init(self.pigan_state.d.params)
            )

        step_fn = make_pigan_step(
            self.generator, self.discriminator, self.forward_model,
            g_tx, d_tx, settings, self.ds.param_lo, self.ds.param_hi,
        )
        override_key = (
            (lr_g, lr_d, schedule_g, schedule_d, epochs)
            if any(x is not None for x in (lr_g, lr_d, schedule_g, schedule_d))
            else None
        )
        multi_epoch = self._maybe_megakernel(settings, override_key)
        mega_active = multi_epoch is not None

        def _xla_epoch_fn():
            return self._make_multi_epoch(
                step_fn, with_scale=True, cache_key=("gan", settings, override_key)
            )

        if multi_epoch is None:
            multi_epoch = _xla_epoch_fn()

        best_val, best_state = None, None
        # `seed` lets resumable callers vary the shuffle/noise key stream per
        # chunk of epochs (pass the epoch offset), so N chunked calls do not
        # replay N identical key sequences
        key = jax.random.PRNGKey(cfg.train.seed + 3000 + seed)
        t0 = time.time()
        epoch = 0
        stop = False
        # globally monotonic checkpoint steps across chunk-resumable calls
        ckpt_base = len(self.train_history.get("pigan/d_loss", []))
        xla_routes = (
            self._plan_small_grid_routes(epochs, forward=False)
            if mega_active and not getattr(multi_epoch, "sub_epoch", False)
            else set()
        )
        while epoch < epochs and not stop:
            chunk = min(self.epochs_per_call, epochs - epoch)
            if mega_active and not getattr(multi_epoch, "sub_epoch", False):
                # the sub-epoch driver (datasets past the one-program
                # envelope) enforces the per-program bound internally —
                # every sub-call is one single launch of <= _MAX_GRID steps
                chunk = self._mega_gan_chunk_cap(chunk)
            key, sub = jax.random.split(key)
            scales = jnp.asarray(
                [
                    constraint_schedule(epoch + j) if constraint_schedule else 1.0
                    for j in range(chunk)
                ],
                jnp.float32,
            )
            routed = mega_active and epoch in xla_routes
            if routed:
                # planned route (small-grid miscompile class), NOT a trip:
                # the megakernel stays engaged for the remaining chunks
                self._log_always(
                    f"pigan chunk at epoch {epoch} ({chunk} epochs) planned "
                    "onto the XLA path (v5e small-grid envelope)"
                )
            fn, active = (_xla_epoch_fn(), False) if routed \
                else (multi_epoch, mega_active)
            self.pigan_state, rows, fn, active = self._chunk_with_fallback(
                fn, active, _xla_epoch_fn,
                self.pigan_state, sub, scales, "pigan", at=epoch,
            )
            if not routed:
                multi_epoch, mega_active = fn, active
            chunk_has_best = False
            for j in range(chunk):
                e = epoch + j
                mf = {k: v[j] for k, v in rows.items()}
                self._record(mf, "pigan/", e)
                if (e + 1) % log_every == 0:
                    self._log(
                        f"[pigan] epoch {e + 1}/{epochs} "
                        f"D={mf['d_loss']:.4f} G={mf['g_loss']:.4f} "
                        f"viol={mf['violation_rate']:.3f} "
                        f"({(time.time() - t0) / (e + 1):.2f}s/ep)"
                    )
                if snapshot_metric is not None:
                    val = mf[snapshot_metric]
                    better = (
                        best_val is None
                        or (snapshot_mode == "min" and val < best_val)
                        or (snapshot_mode == "max" and val > best_val)
                    )
                    if better:
                        best_val = val
                        chunk_has_best = True
                if early_stop is not None and early_stop(mf):
                    self._log(f"[pigan] early stop at epoch {e + 1}")
                    stop = True
                    break
            if chunk_has_best:
                # snapshot at chunk granularity (copy: next call donates)
                best_state = jax.tree.map(jnp.copy, self.pigan_state)
            if checkpoint_manager is not None:
                checkpoint_manager.maybe_save(
                    ckpt_base + epoch + chunk, self.pigan_state,
                    history=self.train_history, config=self.cfg,
                )
            epoch += chunk
            self._progress("pigan", t0, epoch, epochs,
                           program_key=(settings, override_key))
        if snapshot_metric is not None and best_state is not None:
            self.pigan_state = best_state
            self._log(f"[pigan] restored best snapshot ({snapshot_metric}={best_val:.4f})")
        return self.train_history

    # ------------------------------------------------------------------
    # Resume (payload parity: unified_constraint_trainer.py:1140-1176 —
    # epoch + models + optimizer moments + history + config all come back)
    # ------------------------------------------------------------------
    def resume_from(
        self, manager: ckpt.CheckpointManager, which: str = "pigan",
        epoch: int | None = None,
    ) -> Optional[int]:
        """Restore the latest (or a specific) checkpoint from `manager` into
        this trainer — full train state (weights, optimizer moments, PRNG,
        step) AND the train history, so the loss curve continues rather than
        restarting.  Returns the restored epoch, or None if the manager is
        empty."""
        if which == "pigan":
            if self.pigan_state is None:
                self.init_pigan()
            try:
                step, state, meta = manager.restore_with_meta(
                    self.pigan_state, epoch
                )
            except Exception:
                # pytree-structure mismatch on the optional EMA subtree:
                # a checkpoint from an EMA run restored into a plain
                # template (or vice versa).  Retry with the toggled
                # template; any other structural error re-raises below.
                if self.pigan_state.g_ema is None:
                    template = self.pigan_state.replace(
                        g_ema=jax.tree.map(jnp.copy, self.pigan_state.g.params)
                    )
                else:
                    template = self.pigan_state.replace(g_ema=None)
                step, state, meta = manager.restore_with_meta(template, epoch)
            if step is None:
                return None
            self.pigan_state = state
        elif which == "forward":
            if self.forward_state is None:
                self.pretrain_forward(epochs=0)
            step, state, meta = manager.restore_with_meta(self.forward_state, epoch)
            if step is None:
                return None
            self.forward_state = state
        else:
            raise ValueError(f"unknown target: {which!r}")
        if meta and meta.get("history"):
            self.train_history = {
                k: [float(x) for x in v] for k, v in meta["history"].items()
            }
        if meta and isinstance(meta.get("config"), dict):
            # same-SHAPE config drift restores cleanly but silently changes
            # semantics (e.g. leaky_slope, dropout rates) — warn on any
            # model-section difference vs the checkpoint's recorded config
            from ..config import _to_dict

            cur = _to_dict(self.cfg)
            for sec in ("generator", "discriminator", "forward_model"):
                saved_sec = meta["config"].get(sec)
                if saved_sec is not None and saved_sec != cur.get(sec):
                    diff = {
                        k: (v, cur[sec].get(k))
                        for k, v in saved_sec.items()
                        if cur[sec].get(k) != v
                    }
                    self._log_always(
                        f"resume: {sec} config differs from the checkpoint's "
                        f"(saved, current): {diff} — the restored weights "
                        "will run under the CURRENT settings"
                    )
        return step

    # ------------------------------------------------------------------
    # Full pipeline (unified_trainer.train_full_pipeline :422-455)
    # ------------------------------------------------------------------
    def train_full_pipeline(
        self,
        forward_epochs: Optional[int] = None,
        gan_epochs: Optional[int] = None,
    ) -> History:
        self.pretrain_forward(epochs=forward_epochs)
        self.init_pigan()
        self.train_pigan(epochs=gan_epochs)
        return self.train_history

    def train(self, mode: str = "full", **kw) -> History:
        """Mode dispatch parity (unified_trainer.py:114-155)."""
        if mode == "forward_only":
            return self.pretrain_forward(**kw)
        if mode == "pigan_only":
            self.init_pigan()
            return self.train_pigan(**kw)
        if mode == "full":
            return self.train_full_pipeline(**kw)
        raise ValueError(f"unknown mode: {mode!r}")

    # ------------------------------------------------------------------
    # Evaluation / artifacts
    # ------------------------------------------------------------------
    def evaluator(
        self, violation_window: tuple = (0.0, 1.0), use_ema: bool = False
    ) -> Evaluator:
        """`use_ema=True` evaluates the EMA generator track (params from
        state.g_ema, auxiliary collections from the live generator) —
        requires training with StepSettings.ema_decay > 0."""
        assert self.pigan_state is not None, "train or init_pigan first"
        st = self.pigan_state
        g_vars = st.g.variables
        if use_ema:
            if st.g_ema is None:
                raise ValueError(
                    "no EMA track: train with StepSettings(ema_decay=...) first"
                )
            g_vars = {"params": st.g_ema, **st.g.extra}
        return Evaluator(
            self.generator, self.discriminator, self.forward_model,
            g_vars, st.d.variables, st.f.variables,
            violation_window=violation_window,
        )

    def evaluate(
        self, key: jax.Array | None = None, violation_window: tuple = (0.0, 1.0),
        use_ema: bool = False,
    ) -> Dict:
        return self.evaluator(
            violation_window, use_ema=use_ema
        ).run_comprehensive_evaluation(self.ds, key)

    def save_final(self, directory: str, backup_tag: str | None = None) -> None:
        """`backup_tag` (e.g. "unified"/"emergency"/a program name) also
        writes per-mode backup copies next to the finals — the reference's
        versioned `*_<mode>.pth` artifacts (unified_trainer.py:653-662)."""
        assert self.pigan_state is not None
        ckpt.save_final_trio(directory, self.pigan_state, backup_tag=backup_tag)
        ckpt.save_model_config(directory, self.cfg)
        ckpt.save_train_history(directory, self.train_history)
        if self.forward_state is not None:
            ckpt.save_pytree(
                directory, ckpt.FORWARD_MODEL_PRETRAINED, self.forward_state.f.variables
            )

    def load_final(self, directory: str) -> None:
        """Load final artifacts — Orbax-native, or reference-trained torch
        ``.pth`` files (interop.py: a user's existing unified_evaluator
        saved_models directory works here unchanged)."""
        if self.pigan_state is None:
            self.init_pigan()
        st = self.pigan_state
        from .state import ModelState

        from .. import interop

        native_trio_complete = all(
            ckpt.exists(directory, n)
            for n in (ckpt.GENERATOR_FINAL, ckpt.DISCRIMINATOR_FINAL,
                      ckpt.FORWARD_MODEL_FINAL)
        )
        # torch artifacts only take precedence when no complete Orbax trio is
        # present — a stray reference .pth next to a full native trio must not
        # shadow it
        if interop.has_torch_artifacts(directory) and not native_trio_complete:
            g, d, f = interop.load_reference_models(
                directory, st.g.variables, st.d.variables, st.f.variables
            )
            missing = [n for n, v in
                       zip(("generator", "discriminator", "forward_model"),
                           (g, d, f)) if v is None]
            if missing:
                raise FileNotFoundError(
                    f"torch artifacts in {directory} are incomplete: "
                    f"missing {missing}"
                )
        else:
            g, d, f = ckpt.load_final_trio(
                directory, st.g.variables, st.d.variables, st.f.variables
            )
        g_ema = None
        if ckpt.exists(directory, ckpt.GENERATOR_EMA):
            ema_vars = ckpt.restore_pytree(
                directory, ckpt.GENERATOR_EMA, st.g.variables
            )
            g_ema = dict(ema_vars)["params"]
        self.pigan_state = st.replace(
            g=ModelState.from_variables(g),
            d=ModelState.from_variables(d),
            f=ModelState.from_variables(f),
            g_ema=g_ema,
        )
        # restore loss curves for the evaluate --plot history panel
        # (save_final wrote them; absent for torch/legacy dirs)
        if not self.train_history:
            history = ckpt.load_train_history(directory)
            if history:
                self.train_history = history
