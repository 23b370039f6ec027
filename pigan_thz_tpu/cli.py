"""Command-line interface.

Replaces the reference's eleven per-script argparse CLIs (six training entry
points under core/train/ and five evaluation wrappers under core/evaluate/,
each re-implementing device setup, seeding, data loading and model loading)
with one `python -m pigan_thz_tpu <command>` surface sharing the config
system.  Every command accepts repeated `--set a.b.c=value` overrides.

Commands:
  generate-data     synthesize a reference-schema CSV dataset
  pretrain-forward  train the forward surrogate           (pretrain_fwd_model.py)
  train             forward_only | pigan_only | full      (unified_trainer.py)
  program           progressive | emergency | finetune    (unified_constraint_trainer.py,
                                                           emergency_trainer.py,
                                                           constraint_optimizer.py)
  evaluate          run the four suites + report          (unified_evaluator.py)
  screen            batched inverse-design screening      (new capability)
  design            targeted inverse design + refinement  (new capability)
  export            StableHLO serving artifacts           (new capability)
  profile           jax.profiler trace + throughput/memory (new capability)
  bench             training-throughput benchmark
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List

from .config import PiGanConfig, apply_overrides, default_config


def _base_parser(sub: argparse.ArgumentParser) -> None:
    sub.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                     help="config override, e.g. --set train.num_epochs=200")
    sub.add_argument("--config", default=None, metavar="YAML",
                     help="YAML config file (applied before --set overrides)")
    sub.add_argument("--csv", default=None, help="dataset CSV path (else synthetic)")
    sub.add_argument("--workdir", default="runs", help="output directory")
    sub.add_argument("--seed", type=int, default=None)
    sub.add_argument("--tensorboard", action=argparse.BooleanOptionalAction,
                     default=True,
                     help="write tfevents scalars under <run_dir>/tb "
                          "(on by default — reference Logger parity; "
                          "torch-free writer, utils/tensorboard.py)")
    sub.add_argument("--wandb", action="store_true",
                     help="also log scalars to Weights & Biases "
                          "(training_optimization.py:220 toggle; needs the "
                          "wandb package)")


def _make_cfg(args) -> PiGanConfig:
    cfg = default_config()
    if args.config:
        from .config import from_yaml

        cfg = from_yaml(args.config, cfg)
    if getattr(args, "preset", None) == "optimized":
        # the reference's OptimizedTrainer overlay (config_presets.py);
        # applied before --set so explicit overrides still win
        from .config_presets import apply_optimization_config

        cfg = apply_optimization_config(cfg)
    elif getattr(args, "preset", None) == "scaled":
        # the round-5 large-batch recipe (RESULTS.md "Scaled-batch mode")
        from .config_presets import apply_scaled_batch_config

        cfg = apply_scaled_batch_config(cfg)
    if args.seed is not None:
        cfg = apply_overrides(cfg, [f"train.seed={args.seed}", f"data.seed={args.seed}"])
    cfg = apply_overrides(cfg, args.set)
    return cfg.replace(workdir=args.workdir)


def _overlay_model_config_dir(
    cfg: PiGanConfig, directory: str, user_set: List[str]
) -> PiGanConfig:
    """Merge <directory>/model_config.json (written by the save paths) into
    cfg so consumers rebuild the saved run's architectures; explicit user
    --set overrides for model sections still win."""
    from .config import dict_to_overrides
    from .train import checkpoint as ckpt_mod

    saved = ckpt_mod.load_model_config(directory)
    if saved is None:
        return cfg
    prefixes = tuple(f"{s}." for s in saved)
    user = [
        o for o in user_set
        if o.partition("=")[0].strip().startswith(prefixes)
    ]
    return apply_overrides(cfg, dict_to_overrides(saved) + user)


def _overlay_saved_model_config(cfg: PiGanConfig, args) -> PiGanConfig:
    """Rebuild a saved run's architectures from --models (evaluate/screen/
    design/export)."""
    return _overlay_model_config_dir(cfg, args.models, args.set)


def _make_trainer(cfg: PiGanConfig, args, name: str, ds=None):
    from .train.trainer import Trainer
    from .utils.logging import RunLogger

    logger = RunLogger(
        cfg.workdir, name=name,
        use_tensorboard=getattr(args, "tensorboard", True),
        use_wandb=getattr(args, "wandb", False),
    )
    return Trainer(cfg, ds=ds, logger=logger, csv_path=args.csv), logger


def _split_holdout(cfg: PiGanConfig, csv_path, frac: float, seed: int):
    """Shuffled train/held-out split of the configured dataset — the honest
    protocol of examples/holdout_eval.py (the reference's overlay declares
    validation_split=0.2, training_optimization.py:103-111, but always
    evaluates on its training CSV).  The SAME (frac, seed) pair at train
    and evaluate time reproduces the identical split."""
    import jax

    from .data import load_or_synthesize, split_dataset

    full = load_or_synthesize(cfg.data, csv_path)
    return split_dataset(full, val_frac=frac, key=jax.random.PRNGKey(seed))


def _holdout_row(ev: dict) -> dict:
    return {
        "param_r2": round(ev["pigan_evaluation"]["parameter_prediction"]["r2"], 4),
        "spectrum_r2": round(
            ev["forward_network_evaluation"]["spectrum_prediction"]["r2"], 4),
        "metrics_r2": round(
            ev["forward_network_evaluation"]["metrics_prediction"]["r2"], 4),
        "cycle": round(ev["model_validation"]["cycle_consistency_error_mean"], 6),
        "violation_rate": round(
            ev["structural_prediction_evaluation"]["param_range_violation_rate"], 4),
    }


def cmd_generate_data(args) -> int:
    cfg = _make_cfg(args)
    from .data import save_csv, synthetic_dataset

    ds = synthetic_dataset(cfg.data)
    save_csv(ds, args.out)
    print(f"wrote {ds.num_samples} samples to {args.out}")
    return 0


def cmd_convert_cst(args) -> int:
    """Raw CST Studio export (dataset/THZ.txt format) -> Freq_* CSV."""
    cfg = _make_cfg(args)
    from .data.cst import convert_cst_export

    def _kv(items, cast):
        out = {}
        flag = "--default" if cast is float else "--param-map"
        for it in items or []:
            k, sep, v = it.partition("=")
            if not sep:
                raise SystemExit(f"{flag} expects key=value, got {it!r}")
            try:
                out[k.strip()] = cast(v.strip())
            except ValueError:
                raise SystemExit(
                    f"{flag} {it!r}: {v.strip()!r} is not a valid "
                    f"{cast.__name__}"
                )
        return out

    n = convert_cst_export(
        args.raw, args.out, cfg=cfg.data,
        param_map=_kv(args.param_map, str),
        defaults=_kv(args.default, float),
        fit_grid=args.fit_grid,
    )
    print(f"converted {n} sample(s) from {args.raw} -> {args.out}")
    return 0


def cmd_pretrain_forward(args) -> int:
    cfg = _make_cfg(args)
    if args.epochs is not None:
        # keep the cosine horizon tied to the actual run length, like the
        # reference's CosineAnnealingLR(T_max=num_epochs)
        cfg = apply_overrides(cfg, [f"train.fwd_pretrain_epochs={args.epochs}"])
    trainer, logger = _make_trainer(cfg, args, "fwd_pretrain")
    trainer.pretrain_forward(epochs=args.epochs, lr=args.lr)
    out = args.out or os.path.join(cfg.workdir, "saved_models")
    from .train import checkpoint as ckpt

    ckpt.save_pytree(out, ckpt.FORWARD_MODEL_PRETRAINED, trainer.forward_state.f.variables)
    ckpt.save_model_config(out, cfg)
    logger.info(f"saved pretrained forward model under {out}")
    logger.close()
    return 0


def cmd_train(args) -> int:
    if getattr(args, "backup_tag", None) in ("final", "ema", "pretrained"):
        # fail BEFORE training, not at the final save (checkpoint.py
        # save_final_trio rejects tags that collide with canonical names)
        raise SystemExit(
            f"--backup-tag {args.backup_tag!r} collides with a canonical "
            "artifact name; pick another tag"
        )
    cfg = _make_cfg(args)
    # Tie LR-schedule horizons to the requested run lengths (the reference
    # passes the actual num_epochs as CosineAnnealingLR T_max,
    # train_pigan.py:61; leaving the default horizon silently caps quality —
    # measured -0.015 param R2 at long budgets, RESULTS.md "Seed-search").
    horizon_overrides = []
    if args.epochs is not None:
        key = ("train.fwd_pretrain_epochs" if args.mode == "forward_only"
               else "train.num_epochs")
        horizon_overrides.append(f"{key}={args.epochs}")
    if args.forward_epochs is not None:
        horizon_overrides.append(f"train.fwd_pretrain_epochs={args.forward_epochs}")
    if horizon_overrides:
        cfg = apply_overrides(cfg, horizon_overrides)
    if args.mode == "pigan_only" and args.forward_model:
        # rebuild the pretrained surrogate's architecture from the
        # model_config.json saved next to it (else the restore template
        # built from the default cfg mismatches a non-mlp artifact)
        cfg = _overlay_model_config_dir(
            cfg, os.path.dirname(os.path.abspath(args.forward_model)),
            args.set,
        )
    holdout_ds = None
    train_ds = None
    if args.holdout:
        train_ds, holdout_ds = _split_holdout(
            cfg, args.csv, args.holdout, args.holdout_seed
        )
    trainer, logger = _make_trainer(cfg, args, f"train_{args.mode}", ds=train_ds)
    from .train.steps import StepSettings

    if args.preset == "optimized":
        # OptimizedTrainer's GAN-phase loss mix (constraint/window/
        # stability on, physics through F), read from the post---set cfg
        # so explicit overrides reach the fused step too; the overlay's
        # own detach_forward=False wins over --fixed-physics
        import dataclasses as _dc

        from .config_presets import step_settings_from_optimized_config

        settings = _dc.replace(
            step_settings_from_optimized_config(cfg), ema_decay=args.ema_decay
        )
    elif args.preset == "scaled":
        # recipe's detach_forward=False comes from the preset overlay (the
        # through-F gradient is what makes the LR-scaled batch converge —
        # RESULTS.md); a conflicting --fixed-physics must be LOUD, not
        # silently dropped
        if args.fixed_physics:
            raise SystemExit(
                "--fixed-physics conflicts with --preset scaled: the recipe "
                "requires through-F gradients (detached physics caps large "
                "batches near R2 0.7 — RESULTS.md 'Scaled-batch mode').  "
                "To force it anyway: --set train.detach_forward=true "
                "without --fixed-physics."
            )
        settings = StepSettings.from_config(cfg, ema_decay=args.ema_decay)
    else:
        settings = StepSettings.from_config(
            cfg, detach_forward=not args.fixed_physics,
            ema_decay=args.ema_decay,
        )
    mgr = None
    if args.checkpoint_dir:
        from .train import checkpoint as ckpt_mod

        mgr = ckpt_mod.CheckpointManager(
            args.checkpoint_dir, save_interval=cfg.train.save_interval
        )
    out = args.out or os.path.join(cfg.workdir, "saved_models")
    if args.mode == "forward_only":
        trainer.pretrain_forward(epochs=args.epochs, checkpoint_manager=mgr)
        from .train import checkpoint as ckpt_mod2

        ckpt_mod2.save_pytree(
            out, ckpt_mod2.FORWARD_MODEL_PRETRAINED,
            trainer.forward_state.f.variables,
        )
        ckpt_mod2.save_model_config(out, cfg)
        logger.info(f"saved pretrained forward model under {out}")
    else:
        if args.mode == "pigan_only":
            if args.forward_model:
                _load_pretrained_forward(trainer, args.forward_model)
        else:
            # full mode checkpoints the GAN stage only: one manager holds one
            # state type (ForwardState and PiGanState have different trees)
            trainer.pretrain_forward(epochs=args.forward_epochs)
        trainer.init_pigan()
        gan_kw = {}
        if args.preset == "scaled":
            # the recipe's warmup schedule rides as a per-phase optimizer
            # override (the preset overlay already set batch/lr/detach)
            from .config_presets import SCALED_BATCH_SCHEDULE

            # schedule-only override: train_pigan defaults the override LRs
            # from cfg.train.lr_g/lr_d (which the overlay already scaled)
            gan_kw = dict(
                schedule_g=SCALED_BATCH_SCHEDULE,
                schedule_d=SCALED_BATCH_SCHEDULE,
            )
        trainer.train_pigan(epochs=args.epochs, settings=settings,
                            checkpoint_manager=mgr, **gan_kw)
        trainer.save_final(out, backup_tag=args.backup_tag)
        logger.info(f"saved final models under {out}")
        if holdout_ds is not None:
            ev = trainer.evaluator()
            summary = {
                "holdout_frac": args.holdout,
                "holdout_seed": args.holdout_seed,
                "train": _holdout_row(
                    ev.run_comprehensive_evaluation(trainer.ds)
                ),
                "heldout": _holdout_row(
                    ev.run_comprehensive_evaluation(holdout_ds)
                ),
            }
            logger.info("held-out evaluation: " + json.dumps(summary))
            with open(os.path.join(logger.run_dir, "holdout_eval.json"),
                      "w") as fh:
                json.dump(summary, fh, indent=2)
            print(json.dumps(summary, indent=2))
    if mgr is not None:
        mgr.close()
    if args.plot:
        from .utils.viz import plot_training_curves

        plot_training_curves(trainer.train_history,
                             os.path.join(logger.run_dir, "training_curves.png"))
    logger.close()
    return 0


def _load_pretrained_forward(trainer, path: str) -> None:
    from .train import checkpoint as ckpt
    from .train.state import ForwardState, ModelState
    import jax
    import jax.numpy as jnp

    directory, name = os.path.split(os.path.abspath(path))
    template = trainer.forward_model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((2, trainer.cfg.data.param_dim)), train=False,
    )
    variables = ckpt.restore_pytree(directory, name, template)
    trainer.forward_state = ForwardState(
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(0),
        f=ModelState.from_variables(variables),
        opt=trainer.f_tx.init(dict(variables)["params"]),
    )


def cmd_program(args) -> int:
    cfg = _make_cfg(args)
    trainer, logger = _make_trainer(cfg, args, f"program_{args.name}")
    from .train import programs as P

    if args.name == "progressive":
        phases = P.progressive_pipeline()
    elif args.name == "emergency":
        phases = [*P.standard_phases(50, 50), *P.emergency_phases()]
    elif args.name == "finetune":
        phases = [P.constraint_finetune_phase()]
    else:
        raise SystemExit(f"unknown program: {args.name}")
    result = P.run_program(trainer, phases)
    logger.info(f"phases run: {result.phases_run}; skipped: {result.phases_skipped}")
    out = args.out or os.path.join(cfg.workdir, "saved_models")
    # per-mode backup copies next to the finals (the reference's versioned
    # *_unified/_emergency.pth artifacts)
    trainer.save_final(out, backup_tag=args.name)
    with open(os.path.join(logger.run_dir, "final_eval.json"), "w") as fh:
        json.dump(result.final_eval, fh, indent=2)
    logger.close()
    return 0


def cmd_evaluate(args) -> int:
    cfg = _make_cfg(args)
    cfg = _overlay_saved_model_config(cfg, args)
    import time as _time

    from .evaluate import (
        SUITE_RUBRICS,
        generate_summary_report,
        noise_ceilings,
        oracle_validation,
    )
    from .train.trainer import Trainer

    holdout = getattr(args, "holdout", 0.0)
    if holdout:
        # honest protocol: evaluate on cells the model never trained on
        # (same frac+seed as `train --holdout` reproduces the exact split)
        train_split, val_split = _split_holdout(
            cfg, args.csv, holdout, args.holdout_seed
        )
        trainer = Trainer(cfg, ds=val_split, csv_path=args.csv)
    else:
        train_split = None
        trainer = Trainer(cfg, csv_path=args.csv)
    trainer.load_final(args.models)
    window = (-1.0, 1.0) if args.violation_window == "sane" else (0.0, 1.0)
    use_ema = getattr(args, "use_ema", False)
    synthetic_data = args.csv is None  # oracle/ceilings only valid then
    if args.suite != "all":
        # per-suite frontends, parity with the reference's four eval CLI
        # wrappers (evaluate_fwd_model / evaluate_pigan /
        # evaluate_structural_prediction / evaluate_model_validation):
        # graded console rubric + dedicated multi-panel figure
        import jax

        ev = trainer.evaluator(violation_window=window, use_ema=use_ema)
        suite_fns = {
            "forward": lambda: ev.forward_network(trainer.ds),
            "pigan": lambda: ev.pigan(trainer.ds),
            "structural": lambda: ev.structural_prediction(trainer.ds),
            "validation": lambda: ev.model_validation(
                trainer.ds, jax.random.PRNGKey(0)
            ),
        }
        res = jax.tree.map(float, suite_fns[args.suite]())
        print(SUITE_RUBRICS[args.suite](res))
        if args.json:
            with open(args.json, "w") as fh:
                json.dump(res, fh, indent=2)
        if args.plot:
            from .utils import eval_viz

            fname, builder = eval_viz.SUITE_FIGURES[args.suite]
            arrays = ev.sample_arrays(trainer.ds)
            path = builder(res, arrays, os.path.join(args.models, fname))
            print(f"\nfigure saved: {path}")
        return 0
    t0 = _time.time()
    # one evaluator for the suites AND the oracle/plots below —
    # trainer.evaluate() would build an identical second one and every
    # jitted eval program would compile twice (minutes on remote TPU)
    ev = trainer.evaluator(violation_window=window, use_ema=use_ema)
    results = ev.run_comprehensive_evaluation(trainer.ds)
    ceilings = oracle = None
    if synthetic_data:
        ceilings = noise_ceilings(trainer.cfg.data)
        oracle = oracle_validation(ev, trainer.ds)
        results["noise_ceilings"] = ceilings
        results["oracle_validation"] = oracle
    results["evaluation_time"] = _time.time() - t0
    report = generate_summary_report(
        results,
        save_path=os.path.join(args.models, "unified_evaluation_report.txt"),
        ceilings=ceilings,
        oracle=oracle,
    )
    print(report)
    if holdout:
        comparison = {
            "holdout_frac": holdout,
            "holdout_seed": args.holdout_seed,
            "heldout": _holdout_row(results),
            "train": _holdout_row(
                ev.run_comprehensive_evaluation(train_split)
            ),
        }
        results["holdout_comparison"] = comparison
        print("\nholdout comparison (train split vs held-out split):")
        print(json.dumps(comparison, indent=2))
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(results, fh, indent=2)
    if args.plot:
        from .utils import eval_viz

        arrays = ev.sample_arrays(trainer.ds)
        suite_results = {
            "forward": results["forward_network_evaluation"],
            "pigan": results["pigan_evaluation"],
            "structural": results["structural_prediction_evaluation"],
            "validation": results["model_validation"],
        }
        for suite, (fname, builder) in eval_viz.SUITE_FIGURES.items():
            kw = (
                {"history": trainer.train_history}
                if suite == "pigan" and trainer.train_history else {}
            )
            builder(
                suite_results[suite], arrays,
                os.path.join(args.models, fname), **kw,
            )
        eval_viz.plot_comprehensive_summary(
            results, os.path.join(args.models, "evaluation_summary.png"),
            ceilings=ceilings,
        )
        # plot_utils-parity sample grids (plot_utils.py:37-161)
        from .utils.viz import plot_forward_predictions, plot_gan_comparison

        st = trainer.pigan_state
        plot_forward_predictions(
            trainer.ds, trainer.forward_model, st.f.variables,
            os.path.join(args.models, "forward_predictions.png"),
        )
        plot_gan_comparison(
            trainer.ds, trainer.generator, st.g.variables,
            trainer.forward_model, st.f.variables,
            os.path.join(args.models, "gan_comparison.png"),
        )
        print(f"figures saved under {args.models}")
    return 0


def cmd_screen(args) -> int:
    if args.pallas and args.dtype == "bfloat16":
        # fail BEFORE model load / tunnel device init (cmd_export pattern)
        raise SystemExit("--pallas supports float32 only; drop --dtype")
    cfg = _make_cfg(args)
    cfg = _overlay_saved_model_config(cfg, args)
    import jax

    from .data import load_or_synthesize
    from .design import ScreeningConfig, screen_designs
    from .models.registry import build_forward_model
    from .train import checkpoint as ckpt
    import jax.numpy as jnp

    ds = load_or_synthesize(cfg.data, args.csv)
    f = build_forward_model(cfg.forward_model, cfg.data.spectrum_dim, cfg.data.metrics_dim)
    template = f.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((2, cfg.data.param_dim)), train=False,
    )
    name = (
        ckpt.FORWARD_MODEL_PRETRAINED
        if ckpt.exists(args.models, ckpt.FORWARD_MODEL_PRETRAINED)
        else ckpt.FORWARD_MODEL_FINAL
    )
    fv = ckpt.restore_pytree(args.models, name, template)
    sc = ScreeningConfig(
        num_candidates=args.candidates, top_k=args.top_k,
        objective=args.objective, chunk_size=args.chunk_size,
        use_pallas=args.pallas, compute_dtype=args.dtype,
    )
    mesh = None
    if args.mesh_data > 1:
        from .parallel import make_mesh

        mesh = make_mesh(data=args.mesh_data, model=1,
                         devices=jax.devices()[: args.mesh_data])
    res = screen_designs(
        f, fv, ds.frequencies, ds.param_lo, ds.param_hi,
        jax.random.PRNGKey(cfg.train.seed), sc, mesh=mesh,
    )
    rows = []
    for i in range(args.top_k):
        if not bool(res.valid[i]):
            continue  # filler row: fewer than top_k candidates scored
        rows.append({
            "rank": i + 1,
            "score": float(res.scores[i]),
            "r1": float(res.params[i, 0]),
            "r2": float(res.params[i, 1]),
            "w": float(res.params[i, 2]),
            "g": float(res.params[i, 3]),
        })
    out = args.out or "screening_results.json"
    with open(out, "w") as fh:
        json.dump({"objective": args.objective, "designs": rows}, fh, indent=2)
    print(f"screened {args.candidates} candidates; top-{args.top_k} -> {out}")
    print(json.dumps(rows[:3], indent=2))
    return 0


def cmd_cache_data(args) -> int:
    """CSV -> .thzb binary cache (~60x faster reload; native/thzio.cpp)."""
    cfg = _make_cfg(args)
    from .data import load_or_synthesize
    from .data.native_io import cache_dataset, load_cached

    ds = load_or_synthesize(cfg.data, args.csv)
    cache_dataset(ds, args.out)
    reloaded = load_cached(args.out, cfg.data.__class__(
        **{**cfg.data.__dict__, "spectrum_dim": ds.spectrum_dim}
    ))
    assert reloaded.num_samples == ds.num_samples
    print(f"cached {ds.num_samples} samples -> {args.out}")
    return 0


def cmd_design(args) -> int:
    """Inverse design for specific target spectra: G prediction + surrogate
    verification, optional gradient refinement and MC-dropout uncertainty."""
    cfg = _make_cfg(args)
    cfg = _overlay_saved_model_config(cfg, args)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from .design import InverseDesigner
    from .train.trainer import Trainer

    trainer = Trainer(cfg, csv_path=args.csv)
    trainer.load_final(args.models)
    st = trainer.pigan_state
    designer = InverseDesigner(
        trainer.generator, trainer.forward_model,
        st.g.variables, st.f.variables, trainer.ds,
    )
    if args.target_file:
        raw = (np.load(args.target_file) if args.target_file.endswith(".npy")
               else np.loadtxt(args.target_file, delimiter=","))
        spectra = jnp.asarray(raw, jnp.float32).reshape(-1, trainer.ds.spectrum_dim)
    else:
        idx = jnp.asarray(args.target_index or [0])
        spectra = trainer.ds.spectra[idx]

    res = designer.design(spectra, refine_steps=args.refine_steps)
    rows = []
    names = ("r1", "r2", "w", "g")
    for i in range(spectra.shape[0]):
        rows.append({
            **{n: float(res.params[i, j]) for j, n in enumerate(names)},
            "spectrum_mse": float(res.spectrum_mse[i]),
        })
    if args.uncertainty:
        _, spec_std, _, met_std = designer.uncertainty(
            spectra, jax.random.PRNGKey(cfg.train.seed),
            params_norm=res.params_norm,
        )
        for i, row in enumerate(rows):
            row["spectrum_std_mean"] = float(jnp.mean(spec_std[i]))
            row["metrics_std_mean"] = float(jnp.mean(met_std[i]))
    out = {"refine_steps": args.refine_steps, "designs": rows}
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(out, fh, indent=2)
    return 0


def cmd_export(args) -> int:
    """Serialize trained models as StableHLO serving artifacts (serve.py)."""
    if args.pallas and args.dtype != "float32":
        raise SystemExit(
            "--pallas and --dtype are mutually exclusive "
            "(the fused kernels run fp32)"
        )
    cfg = _make_cfg(args)
    cfg = _overlay_saved_model_config(cfg, args)
    import jax
    import jax.numpy as jnp

    from . import serve
    from .train.trainer import Trainer

    trainer = Trainer(cfg, csv_path=args.csv)
    if args.artifact == "ensemble":
        # the ensemble-mean predictor (seed_search --save-best snapshot:
        # a full member-stacked PiGanState under 'ensemble_best') — the
        # measured best held-out predictor, exported as ONE artifact
        if not args.ensemble_members or args.ensemble_members < 1:
            raise SystemExit("--artifact ensemble needs --ensemble-members N (>= 1)")
        if args.dtype == "int8":
            raise SystemExit("int8 covers the single-model designer only")
        if args.use_ema or args.pallas:
            raise SystemExit(
                "--use-ema / --pallas are single-model options; the "
                "ensemble artifact serves the members' live weights on "
                "the XLA path"
            )
        from .parallel.ensemble import init_ensemble_states
        from .train import checkpoint as ckpt_mod
        from .train.state import make_optimizers

        spe = max(1, trainer.ds.num_samples // cfg.train.batch_size)
        g_tx, d_tx, _ = make_optimizers(cfg, spe)
        # eval_shape: orbax only needs the shape/dtype tree — don't
        # materialize N full states (real init programs) to discard them
        template = jax.eval_shape(
            lambda: init_ensemble_states(
                trainer.generator, trainer.discriminator,
                trainer.forward_model, g_tx, d_tx, args.ensemble_members,
                jax.random.PRNGKey(0),
                spectrum_dim=trainer.ds.spectrum_dim,
                param_dim=cfg.data.param_dim,
            )
        )
        snap = ckpt_mod.restore_pytree(args.models, "ensemble_best", template)
        f_vars = jax.tree.map(lambda x: x[0], snap.f).variables
        os.makedirs(args.out, exist_ok=True)
        path = serve.export_ensemble_inverse_design(
            trainer.generator, trainer.forward_model,
            snap.g.variables, f_vars, trainer.ds,
            os.path.join(args.out, "ensemble_designer.stablehlo"),
            batch_size=args.batch_size,
            compute_dtype={"bfloat16": jnp.bfloat16}.get(args.dtype),
        )
        print(f"exported {path} ({os.path.getsize(path) / 1e6:.1f} MB)")
        return 0
    trainer.load_final(args.models)
    st = trainer.pigan_state
    g_vars = st.g.variables
    if args.use_ema:
        if st.g_ema is None:
            raise SystemExit(
                f"--use-ema: no 'generator_ema' artifact in {args.models}"
            )
        g_vars = {"params": st.g_ema, **st.g.extra}
    dtype = {"bfloat16": jnp.bfloat16, "int8": "int8"}.get(args.dtype)
    os.makedirs(args.out, exist_ok=True)
    written = []
    if args.artifact in ("designer", "all"):
        written.append(serve.export_inverse_design(
            trainer.generator, trainer.forward_model, g_vars,
            st.f.variables, trainer.ds,
            os.path.join(args.out, "designer.stablehlo"),
            batch_size=args.batch_size, use_pallas=args.pallas,
            compute_dtype=dtype,
        ))
    if args.artifact in ("generator", "all"):
        written.append(serve.export_generator(
            trainer.generator, g_vars, trainer.ds,
            os.path.join(args.out, "generator.stablehlo"),
            batch_size=args.batch_size,
            # int8 quantization covers the designer/surrogate cycle only;
            # bf16 bakes into every artifact (review r4: generator and
            # surrogate silently shipped fp32 under --dtype bfloat16)
            compute_dtype=None if args.dtype == "int8" else dtype,
        ))
    if args.artifact in ("surrogate", "all"):
        written.append(serve.export_forward_surrogate(
            trainer.forward_model, st.f.variables, trainer.ds,
            os.path.join(args.out, "surrogate.stablehlo"),
            batch_size=args.batch_size, use_pallas=args.pallas,
            compute_dtype=dtype,
        ))
    for path in written:
        print(f"exported {path} ({os.path.getsize(path) / 1e6:.1f} MB)")
    return 0


def cmd_profile(args) -> int:
    """Capture a jax.profiler trace of the fused GAN training step plus a
    warmup-aware throughput/memory report (utils/profiling.py)."""
    cfg = _make_cfg(args)
    import jax
    import jax.numpy as jnp

    from .data import load_or_synthesize
    from .models import build_trio
    from .train import (
        StepSettings, init_pigan_state, make_multi_epoch_fn,
        make_optimizers, make_pigan_step,
    )
    from .utils.profiling import StepTimer, device_memory_stats, trace

    ds = load_or_synthesize(cfg.data, args.csv)
    g, d, f = build_trio(cfg)
    spe = max(1, ds.num_samples // cfg.train.batch_size)
    g_tx, d_tx, _ = make_optimizers(cfg, spe)
    state = init_pigan_state(
        g, d, f, g_tx, d_tx, jax.random.PRNGKey(cfg.train.seed),
        spectrum_dim=ds.spectrum_dim, param_dim=cfg.data.param_dim,
    )
    step = make_pigan_step(
        g, d, f, g_tx, d_tx, StepSettings.from_config(cfg),
        ds.param_lo, ds.param_hi,
    )
    multi = make_multi_epoch_fn(step, cfg.train.batch_size, with_scale=True)
    ones = jnp.ones((args.epochs,), jnp.float32)
    # warmup/compile outside the trace so the profile shows steady state
    state, m = multi(state, ds, jax.random.PRNGKey(1), ones)
    jax.block_until_ready(m)

    timer = StepTimer(warmup=1)
    trace_dir = os.path.join(args.trace_dir or os.path.join(cfg.workdir, "trace"))
    with trace(trace_dir):
        for i in range(args.repeats):
            state, m = multi(state, ds, jax.random.PRNGKey(2 + i), ones)
            timer.tick(m)
    report = {
        "trace_dir": trace_dir,
        "epochs_per_call": args.epochs,
        "calls_per_sec": round(timer.steps_per_sec(), 3),
        "train_steps_per_sec": round(timer.steps_per_sec() * args.epochs * spe, 1),
        "device_memory": {
            k: ({kk: v[kk] for kk in ("bytes_in_use", "peak_bytes_in_use")
                 if kk in v} if isinstance(v, dict) else v)
            for k, v in device_memory_stats().items()
        },
    }
    print(json.dumps(report, indent=2))
    print(f"open the trace with: tensorboard --logdir {trace_dir}")
    return 0


def cmd_doctor(args) -> int:
    """Environment health report: device reachability (hang-proof probe in
    a killable subprocess — the TPU relay tunnel can wedge at device init
    and freeze any process that touches the backend, CLAUDE.md gotchas),
    compile cache, native IO extension, and a device round-trip timing."""
    checks = []

    def add(name, ok, detail=""):
        checks.append({"check": name, "ok": bool(ok), "detail": detail})
        mark = "ok " if ok else "FAIL"
        print(f"[{mark}] {name}{': ' + detail if detail else ''}")

    import platform
    import subprocess
    import time as _time

    print(f"python {platform.python_version()} on {platform.platform()}")
    import jax

    add("jax", True, jax.__version__)

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache",
    )
    n_entries = (
        len(os.listdir(cache)) if os.path.isdir(cache) else 0
    )
    # informational (an empty cache is normal on a fresh checkout)
    add("compile cache", True,
        f"{cache} ({n_entries} entries)" if n_entries else
        f"{cache} missing/empty — first compiles will be slow")

    try:
        from .data.native_io import native_available

        ok = native_available()
        add("native IO extension", ok,
            "C++ CSV parser built" if ok else "build failed (pandas fallback)")
    except Exception as e:  # noqa: BLE001 — report, don't crash the doctor
        add("native IO extension", False, f"{type(e).__name__}: {e}")

    # megakernel engagement verdicts for the CURRENT config (pure planning,
    # no device; informational — an XLA-path config is not a failure)
    try:
        from .ops import megakernel as MK
        from .train.steps import StepSettings

        cfg = _make_cfg(args)
        settings = StepSettings.from_config(cfg)
        r_gan = MK.supports_megakernel(cfg, settings)
        # max(1, ...) mirrors the Trainer's steps_per_epoch, so the
        # verdicts track actual routing for tiny datasets
        spe = max(1, cfg.data.num_samples // cfg.train.batch_size)
        gan_sub = False
        if r_gan is None:
            # mirror Trainer._maybe_megakernel's routing: one EPOCH past
            # the per-program envelope goes to the chained sub-epoch
            # driver (its tighter stochastic-knob envelope applies)
            spe_pad = MK._launch_plan(2, spe)[3]
            if spe_pad > MK._MAX_PROGRAM_GRID:
                sub_reason = MK.supports_gan_subepoch(settings)
                if sub_reason is not None:
                    r_gan = (f"dataset past the one-program envelope "
                             f"({spe_pad} > {MK._MAX_PROGRAM_GRID}) and "
                             f"{sub_reason}")
                else:
                    gan_sub = True
        add("GAN megakernel", True,
            ("engages on TPU"
             + (" (chained sub-epoch driver)" if gan_sub else ""))
            if r_gan is None else f"XLA path: {r_gan}")
        r_fwd = MK.supports_forward_megakernel(cfg)
        if r_fwd is None and spe > MK._FWD_MAX_TOTAL and not MK._FWD_SUB_AUTO_OK:
            # the Trainer's auto gate is OFF-switched (_FWD_SUB_AUTO_OK)
            r_fwd = (f"steps_per_epoch {spe} > {MK._FWD_MAX_TOTAL}: auto "
                     "mode pretrains on XLA (sub-epoch driver off-switched)")
        add("forward megakernel", True,
            ("engages on TPU "
             + (f"(steps_per_epoch {spe} <= {MK._FWD_MAX_TOTAL})"
                if spe <= MK._FWD_MAX_TOTAL
                else f"(sub-epoch driver: steps_per_epoch {spe})"))
            if r_fwd is None else f"XLA path: {r_fwd}")
    except Exception as e:  # noqa: BLE001
        add("megakernel envelope", False, f"{type(e).__name__}: {e}")

    # device probe in a killable subprocess: NEVER hangs this process
    probe = (
        "import jax, time\n"
        + ("jax.config.update('jax_platforms', 'cpu')\n" if args.cpu else "")
        + "t0 = time.time()\n"
        "d = jax.devices()\n"
        "import jax.numpy as jnp\n"
        "x = jnp.ones((8, 8))\n"
        "t1 = time.time()\n"
        "v = float(jax.device_get((x @ x).sum()))\n"
        "rtt = time.time() - t1\n"
        "print(f'{d[0].platform} {len(d)} {time.time()-t0:.1f} "
        "{rtt*1000:.1f} {v}')\n"
    )
    t0 = _time.time()
    try:
        out = subprocess.run(
            [sys.executable, "-c", probe], capture_output=True, text=True,
            timeout=args.timeout,
        )
        if out.returncode == 0 and out.stdout.strip():
            try:
                # last line only: runtimes may print banners to stdout
                plat, n, init_s, rtt_ms, v = (
                    out.stdout.strip().splitlines()[-1].split()
                )
                add("device", float(v) == 512.0,  # sum(ones(8,8)@ones(8,8))
                    f"{n}x {plat}, init {init_s}s, round-trip {rtt_ms} ms")
            except ValueError:
                add("device", False,
                    f"unparseable probe output: {out.stdout.strip()[-200:]}")
        else:
            add("device", False,
                f"probe rc={out.returncode}: {out.stderr.strip()[-200:]}")
    except subprocess.TimeoutExpired:
        add("device", False,
            f"probe hung >{args.timeout}s — backend unreachable.  The "
            "TPU is SINGLE-CLIENT: another running training/bench process "
            "blocks new clients until it exits (check with ps).  If none "
            "is running, this is a tunnel wedge: kill stuck clients and "
            "retry, or run on CPU via "
            "jax.config.update('jax_platforms','cpu')")
    print(f"doctor finished in {_time.time() - t0:.1f}s")
    if args.json:
        with open(args.json, "w") as fh:
            json.dump(checks, fh, indent=2)
    return 0 if all(c["ok"] for c in checks) else 1


def cmd_bench(args) -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    import importlib

    bench = importlib.import_module("bench")
    bench.main()
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="pigan_thz_tpu", description=__doc__)
    sub = p.add_subparsers(dest="command", required=True)

    g = sub.add_parser("generate-data", help="synthesize a CSV dataset")
    _base_parser(g)
    g.add_argument("--out", default="dataset/THz_Metamaterial_Spectra_With_Metrics.csv")
    g.set_defaults(fn=cmd_generate_data)

    g = sub.add_parser(
        "convert-cst",
        help="convert a raw CST export (THZ.txt format) to the Freq_* CSV",
    )
    _base_parser(g)
    g.add_argument("raw", help="raw CST text export path")
    g.add_argument("--out", default="dataset/converted.csv")
    g.add_argument("--param-map", action="append", metavar="NAME=KEY",
                   help="dataset column -> export parameter key (e.g. g=p)")
    g.add_argument("--default", action="append", metavar="NAME=VALUE",
                   help="value for a structural parameter the export lacks")
    g.add_argument("--fit-grid", action="store_true",
                   help="derive the frequency grid from the export's sweep "
                        "instead of requiring it to cover data.freq_min/max")
    g.set_defaults(fn=cmd_convert_cst)

    g = sub.add_parser("pretrain-forward", help="pretrain the forward surrogate")
    _base_parser(g)
    g.add_argument("--epochs", type=int, default=None)
    g.add_argument("--lr", type=float, default=None)
    g.add_argument("--out", default=None)
    g.set_defaults(fn=cmd_pretrain_forward)

    g = sub.add_parser("train", help="train models")
    _base_parser(g)
    g.add_argument("--mode", choices=["forward_only", "pigan_only", "full"],
                   default="full")
    g.add_argument("--epochs", type=int, default=None)
    g.add_argument("--forward-epochs", type=int, default=None)
    g.add_argument("--forward-model", default=None,
                   help="path to pretrained forward model (dir/name)")
    g.add_argument("--ema-decay", type=float, default=0.0,
                   help="EMA decay for the generator track (0 = off); the "
                        "EMA generator is saved as 'generator_ema'")
    g.add_argument("--fixed-physics", action="store_true",
                   help="let physics-loss gradients flow through frozen F "
                        "(recommended; default reproduces the reference's "
                        "no_grad behaviour)")
    g.add_argument("--holdout", type=float, default=0.0, metavar="FRAC",
                   help="train on a (1-FRAC) split and report train vs "
                        "held-out metrics (the honest protocol of "
                        "examples/holdout_eval.py; the reference's "
                        "validation_split knob, made real)")
    g.add_argument("--holdout-seed", type=int, default=9,
                   help="split shuffle seed; reuse at evaluate time to "
                        "reproduce the identical split")
    g.add_argument("--preset", default=None, choices=["optimized", "scaled"],
                   help="'optimized': the reference OptimizedTrainer overlay "
                        "(config_presets.py: residual G, dual-encoder D, "
                        "overlay LRs/loss mix); 'scaled': the measured "
                        "large-batch recipe (batch 512, lr x2, "
                        "warmup_cosine, through-F gradients — RESULTS.md "
                        "'Scaled-batch mode').  --set still overrides")
    g.add_argument("--backup-tag", default=None, metavar="TAG",
                   help="also write versioned backup artifacts "
                        "generator_<TAG>/... next to the finals (reference "
                        "*_unified.pth parity)")
    g.add_argument("--out", default=None)
    g.add_argument("--plot", action="store_true")
    g.add_argument("--checkpoint-dir", default=None,
                   help="periodic full-state checkpoints every "
                        "train.save_interval epochs (resume-capable)")
    g.set_defaults(fn=cmd_train)

    g = sub.add_parser("program", help="run a multi-phase training program")
    _base_parser(g)
    g.add_argument("name", choices=["progressive", "emergency", "finetune"])
    g.add_argument("--out", default=None)
    g.set_defaults(fn=cmd_program)

    g = sub.add_parser("evaluate", help="run the four evaluation suites")
    _base_parser(g)
    g.add_argument("--models", required=True, help="saved_models directory")
    g.add_argument("--suite", default="all",
                   choices=["all", "forward", "pigan", "structural", "validation"],
                   help="run one suite only (parity with the per-suite CLIs)")
    g.add_argument("--use-ema", action="store_true",
                   help="evaluate the EMA generator track (requires a "
                        "'generator_ema' artifact in --models)")
    g.add_argument("--violation-window", default="parity",
                   choices=["parity", "sane"],
                   help="parity: reference's [0,1] window on tanh outputs; "
                        "sane: [-1,1] convention-consistent window")
    g.add_argument("--holdout", type=float, default=0.0, metavar="FRAC",
                   help="evaluate on the held-out FRAC split (same "
                        "frac+seed as `train --holdout` reproduces that "
                        "run's exact split); the main report then scores "
                        "UNSEEN cells, with a train-vs-heldout comparison")
    g.add_argument("--holdout-seed", type=int, default=9)
    g.add_argument("--json", default=None, help="also dump results JSON")
    g.add_argument("--plot", action="store_true")
    g.set_defaults(fn=cmd_evaluate)

    g = sub.add_parser("screen", help="batched inverse-design screening")
    _base_parser(g)
    g.add_argument("--models", required=True)
    g.add_argument("--candidates", type=int, default=1_000_000)
    g.add_argument("--top-k", type=int, default=100)
    g.add_argument("--chunk-size", type=int, default=8192)
    g.add_argument("--objective", default="FoM1")
    g.add_argument("--pallas", action="store_true")
    g.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="surrogate forward-pass dtype; bfloat16 = the "
                        "serving fast path (rankings may differ near ties)")
    g.add_argument("--mesh-data", type=int, default=1,
                   help="shard candidate batches over N devices")
    g.add_argument("--out", default=None)
    g.set_defaults(fn=cmd_screen)

    g = sub.add_parser("design", help="inverse design for target spectra")
    _base_parser(g)
    g.add_argument("--models", required=True, help="saved_models directory")
    g.add_argument("--target-index", type=int, action="append", default=None,
                   help="dataset row(s) to use as targets (repeatable)")
    g.add_argument("--target-file", default=None,
                   help=".npy or CSV file of target spectra (rows of S points)")
    g.add_argument("--refine-steps", type=int, default=0,
                   help="surrogate-gradient refinement steps (0 = G only)")
    g.add_argument("--uncertainty", action="store_true",
                   help="MC-dropout spread of the surrogate verification")
    g.add_argument("--out", default=None, help="also write results JSON here")
    g.set_defaults(fn=cmd_design)

    g = sub.add_parser("export", help="StableHLO serving artifacts")
    _base_parser(g)
    g.add_argument("--models", required=True, help="saved_models directory")
    g.add_argument("--artifact", default="all",
                   choices=["all", "designer", "generator", "surrogate",
                            "ensemble"])
    g.add_argument("--ensemble-members", type=int, default=None,
                   help="--artifact ensemble: member count of the "
                        "'ensemble_best' snapshot in --models "
                        "(examples/seed_search.py --save-best)")
    g.add_argument("--out", default="exported")
    g.add_argument("--batch-size", type=int, default=8192)
    g.add_argument("--use-ema", action="store_true",
                   help="export the EMA generator track (requires a "
                        "'generator_ema' artifact in --models)")
    g.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16", "int8"],
                   help="bfloat16 = measured 2.06x serving throughput at large "
                        "batch; int8 = post-training quantized designer/"
                        "surrogate artifacts (baseline trio)")
    g.add_argument("--pallas", action="store_true",
                   help="fused-kernel TPU-only artifact (baseline trio only)")
    g.set_defaults(fn=cmd_export)

    g = sub.add_parser("cache-data", help="CSV -> binary .thzb cache")
    _base_parser(g)
    g.add_argument("--out", default="dataset/thz.thzb")
    g.set_defaults(fn=cmd_cache_data)

    g = sub.add_parser("profile", help="jax.profiler trace of the train step")
    _base_parser(g)
    g.add_argument("--epochs", type=int, default=10,
                   help="epochs per traced jit call")
    g.add_argument("--repeats", type=int, default=3,
                   help="traced calls (first is timer warmup)")
    g.add_argument("--trace-dir", default=None)
    g.set_defaults(fn=cmd_profile)

    g = sub.add_parser("doctor", help="environment health report")
    _base_parser(g)   # --set/--config: envelope verdicts for YOUR config
    g.add_argument("--timeout", type=int, default=90,
                   help="device-probe budget in seconds (the probe runs in "
                        "a killable subprocess and cannot hang the CLI)")
    g.add_argument("--json", default=None, help="also write checks as JSON")
    g.add_argument("--cpu", action="store_true",
                   help="probe the CPU backend (the env-var route is "
                        "ignored when the axon TPU plugin is installed)")
    g.set_defaults(fn=cmd_doctor)

    g = sub.add_parser("bench", help="training throughput benchmark")
    _base_parser(g)
    g.set_defaults(fn=cmd_bench)
    return p


def main(argv: List[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
