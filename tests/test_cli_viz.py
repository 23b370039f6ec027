"""CLI + visualization smoke tests (tiny configs; CSV round trip through the
command surface)."""

import json
import os

import numpy as np
import pytest

from pigan_thz_tpu.cli import main


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli"))


@pytest.mark.slow
def test_cli_generate_train_evaluate_screen(workdir):
    csv = os.path.join(workdir, "thz.csv")
    assert main(["generate-data", "--out", csv, "--set", "data.num_samples=96"]) == 0
    assert os.path.exists(csv)

    runs = os.path.join(workdir, "runs")
    assert main([
        "train", "--mode", "full", "--epochs", "2", "--forward-epochs", "3",
        "--fixed-physics", "--csv", csv, "--workdir", runs,
        "--set", "data.num_samples=96", "--set", "train.batch_size=32",
    ]) == 0
    models = os.path.join(runs, "saved_models")
    assert os.path.isdir(os.path.join(models, "generator_final"))

    ev_json = os.path.join(workdir, "eval.json")
    assert main([
        "evaluate", "--models", models, "--csv", csv, "--json", ev_json,
        "--set", "data.num_samples=96",
    ]) == 0
    with open(ev_json) as fh:
        results = json.load(fh)
    assert "pigan_evaluation" in results
    assert os.path.exists(os.path.join(models, "unified_evaluation_report.txt"))

    designs = os.path.join(workdir, "designs.json")
    assert main([
        "screen", "--models", models, "--candidates", "2048", "--top-k", "5",
        "--chunk-size", "1024", "--out", designs, "--csv", csv,
        "--set", "data.num_samples=96",
    ]) == 0
    with open(designs) as fh:
        data = json.load(fh)
    assert len(data["designs"]) == 5
    assert data["designs"][0]["score"] >= data["designs"][-1]["score"]


def test_cli_bad_override_errors(workdir):
    with pytest.raises(KeyError):
        main(["generate-data", "--out", os.path.join(workdir, "x.csv"),
              "--set", "train.nope=1"])


@pytest.mark.slow
def test_viz_functions(workdir, small_ds, cfg):
    import jax

    from pigan_thz_tpu.models import build_trio
    from pigan_thz_tpu.utils.viz import (
        plot_evaluation_summary,
        plot_forward_predictions,
        plot_gan_comparison,
        plot_training_curves,
    )
    from pigan_thz_tpu.evaluate import Evaluator

    g, d, f = build_trio(cfg)
    k = jax.random.PRNGKey(0)
    gv = g.init(k, small_ds.spectra[:2], train=False)
    dv = d.init(k, small_ds.spectra[:2], small_ds.params[:2], train=False)
    fv = f.init({"params": k, "dropout": k}, small_ds.params_norm[:2], train=False)

    p1 = plot_training_curves({"pigan/g_loss": [3.0, 2.0, 1.5], "pigan/d_loss": [1.0, 0.9, 0.8]},
                              os.path.join(workdir, "curves.png"))
    p2 = plot_forward_predictions(small_ds, f, fv, os.path.join(workdir, "fwd.png"))
    p3 = plot_gan_comparison(small_ds, g, gv, f, fv, os.path.join(workdir, "gan.png"))
    ev = Evaluator(g, d, f, gv, dv, fv)
    res = ev.run_comprehensive_evaluation(small_ds)
    p4 = plot_evaluation_summary(res, os.path.join(workdir, "summary.png"))
    for p in (p1, p2, p3, p4):
        assert os.path.exists(p) and os.path.getsize(p) > 10_000


@pytest.mark.slow
def test_cli_design_refine_improves_match(tmp_path, cfg, small_ds, capsys):
    """CLI design: G-only vs refined — refinement must not worsen the
    surrogate match; JSON written with physical params."""
    import json as _json

    import jax

    from pigan_thz_tpu.cli import main
    from pigan_thz_tpu.train import Trainer

    t = Trainer(cfg, ds=small_ds, epochs_per_call=2)
    t.pretrain_forward(epochs=2, log_every=10**9)
    t.init_pigan()
    models = tmp_path / "saved_models"
    t.save_final(str(models))

    rc = main([
        "design", "--models", str(models), "--target-index", "0",
        "--target-index", "1", "--refine-steps", "0",
        "--set", f"data.num_samples={small_ds.num_samples}",
        "--out", str(tmp_path / "plain.json"),
    ])
    assert rc == 0
    rc = main([
        "design", "--models", str(models), "--target-index", "0",
        "--target-index", "1", "--refine-steps", "50", "--uncertainty",
        "--set", f"data.num_samples={small_ds.num_samples}",
        "--out", str(tmp_path / "refined.json"),
    ])
    assert rc == 0
    plain = _json.load(open(tmp_path / "plain.json"))
    refined = _json.load(open(tmp_path / "refined.json"))
    assert len(plain["designs"]) == 2
    for a, b in zip(plain["designs"], refined["designs"]):
        assert b["spectrum_mse"] <= a["spectrum_mse"] + 1e-6
        assert 2.2 <= b["r1"] <= 2.8 and 2.2 <= b["g"] <= 2.8
        assert "spectrum_std_mean" in b


def test_cli_epochs_sets_schedule_horizon(monkeypatch):
    """--epochs must set the LR-schedule horizon (reference ties
    CosineAnnealingLR T_max to the run length, train_pigan.py:61)."""
    import pigan_thz_tpu.cli as cli

    captured = {}

    def fake_make_trainer(cfg, args, name, ds=None):
        captured["cfg"] = cfg
        raise RuntimeError("stop-after-config")

    monkeypatch.setattr(cli, "_make_trainer", fake_make_trainer)
    with pytest.raises(RuntimeError, match="stop-after-config"):
        cli.main(["train", "--mode", "pigan_only", "--epochs", "1234"])
    assert captured["cfg"].train.num_epochs == 1234

    with pytest.raises(RuntimeError, match="stop-after-config"):
        cli.main(["train", "--mode", "forward_only", "--epochs", "77"])
    assert captured["cfg"].train.fwd_pretrain_epochs == 77


@pytest.mark.slow
def test_cli_profile_writes_trace(tmp_path, capsys):
    from pigan_thz_tpu.cli import main

    rc = main([
        "profile", "--epochs", "2", "--repeats", "2",
        "--trace-dir", str(tmp_path / "trace"),
        "--set", "data.num_samples=128",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "train_steps_per_sec" in out
    assert (tmp_path / "trace").exists()
    # a profile plugin directory with at least one capture
    profile_dir = tmp_path / "trace" / "plugins" / "profile"
    assert profile_dir.exists() and any(profile_dir.iterdir())


@pytest.mark.slow
def test_cli_holdout_protocol(tmp_path):
    """`train --holdout` trains on the (1-frac) split and reports both
    splits; `evaluate --holdout` with the same frac+seed scores the SAME
    held-out cells (round-2 VERDICT #5: the honest protocol in the CLI)."""
    wd = str(tmp_path)
    runs = os.path.join(wd, "runs")
    common = ["--set", "data.num_samples=128", "--set", "train.batch_size=32"]
    assert main([
        "train", "--mode", "full", "--epochs", "2", "--forward-epochs", "2",
        "--fixed-physics", "--workdir", runs,
        "--holdout", "0.25", "--holdout-seed", "4", *common,
    ]) == 0
    run_dirs = [d for d in os.listdir(runs) if d.startswith("train_full")]
    hpath = None
    for d in run_dirs:
        cand = os.path.join(runs, d, "holdout_eval.json")
        if os.path.exists(cand):
            hpath = cand
    assert hpath is not None
    with open(hpath) as fh:
        summary = json.load(fh)
    assert set(summary) >= {"train", "heldout"}
    assert "param_r2" in summary["heldout"]

    models = os.path.join(runs, "saved_models")
    ev_json = os.path.join(wd, "eval_holdout.json")
    assert main([
        "evaluate", "--models", models, "--json", ev_json,
        "--holdout", "0.25", "--holdout-seed", "4", *common,
    ]) == 0
    with open(ev_json) as fh:
        results = json.load(fh)
    comp = results["holdout_comparison"]
    # identical split at train and evaluate time: same held-out metrics
    assert comp["heldout"]["param_r2"] == pytest.approx(
        summary["heldout"]["param_r2"], abs=1e-6
    )
