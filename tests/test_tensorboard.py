"""Dependency-free tfevents writer (utils/tensorboard.py) — VERDICT r4 #6.

Validated three ways: crc32c against the known Castagnoli test vector,
round-trip through our own reader, and — when the real tensorboard package
is importable — cross-checked byte-level against tensorboard's own
EventFileLoader (proving stock TensorBoard can read our files)."""

import math
import os

import pytest

from pigan_thz_tpu.utils.tensorboard import (
    TfEventsWriter,
    _crc32c,
    _masked_crc,
    read_scalar_events,
)


def test_crc32c_test_vector():
    # RFC 3720 / Castagnoli reference vector
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0
    assert _masked_crc(b"123456789") == ((0xE3069283 >> 15 | (0xE3069283 << 17))
                                         + 0xA282EAD8) & 0xFFFFFFFF


def test_writer_roundtrip(tmp_path):
    w = TfEventsWriter(str(tmp_path))
    w.add_scalar("loss/train", 0.125, step=1)
    w.add_scalar("loss/train", 0.0625, step=2)
    w.add_scalar("accuracy", 0.875, step=2)
    w.close()
    events = read_scalar_events(w.path)
    assert events == [
        ("loss/train", 0.125, 1),
        ("loss/train", 0.0625, 2),
        ("accuracy", 0.875, 2),
    ]


def test_stock_tensorboard_reads_our_files(tmp_path):
    loader_mod = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")
    w = TfEventsWriter(str(tmp_path))
    w.add_scalar("metrics/r2", 0.9941, step=3000)
    w.add_scalar("metrics/r2", 0.5, step=1)
    w.close()
    events = list(loader_mod.EventFileLoader(w.path).Load())
    assert events[0].file_version == "brain.Event:2"

    def _value(v):
        # newer tensorboard migrates simple_value -> rank-0 tensor
        if v.WhichOneof("value") == "tensor":
            return v.tensor.float_val[0]
        return v.simple_value

    scalars = [
        (v.tag, _value(v), e.step)
        for e in events for v in e.summary.value
    ]
    assert ("metrics/r2", pytest.approx(0.9941), 3000) in scalars
    assert ("metrics/r2", 0.5, 1) in scalars


def test_our_reader_reads_torch_summarywriter_files(tmp_path):
    torch_tb = pytest.importorskip("torch.utils.tensorboard")
    w = torch_tb.SummaryWriter(log_dir=str(tmp_path / "torch"))
    w.add_scalar("x", 1.5, 7)
    w.add_scalar("y", -2.0, 8)
    w.close()
    files = [
        os.path.join(tmp_path, "torch", f)
        for f in os.listdir(tmp_path / "torch")
    ]
    got = []
    for f in files:
        got.extend(read_scalar_events(f))
    tags = {(t, v, s) for t, v, s in got}
    assert ("x", 1.5, 7) in tags and ("y", -2.0, 8) in tags


def test_runlogger_writes_tb_by_default(tmp_path):
    """Reference parity: Logger constructs its SummaryWriter unconditionally
    (core/utils/logger.py:47) — RunLogger's TB stream is on by default and
    needs no torch import."""
    from pigan_thz_tpu.utils.logging import RunLogger

    lg = RunLogger(str(tmp_path), name="t", stdout=False)
    lg.add_scalars({"loss": 0.5, "g_loss": 1.25}, step=4, prefix="gan/")
    lg.close()
    tb_dir = os.path.join(lg.run_dir, "tb")
    files = os.listdir(tb_dir)
    assert len(files) == 1 and files[0].startswith("events.out.tfevents.")
    events = read_scalar_events(os.path.join(tb_dir, files[0]))
    assert ("gan/loss", 0.5, 4) in events
    assert ("gan/g_loss", 1.25, 4) in events


def test_writer_handles_nonfinite_and_unicode(tmp_path):
    w = TfEventsWriter(str(tmp_path))
    w.add_scalar("λ/loss", float("inf"), step=0)
    w.add_scalar("λ/loss", float("nan"), step=1)
    w.close()
    events = read_scalar_events(w.path)
    assert events[0] == ("λ/loss", float("inf"), 0)
    assert events[1][0] == "λ/loss" and math.isnan(events[1][1])


def test_truncated_tail_reads_gracefully(tmp_path):
    """Killed writers leave half-written final records — the reader must
    return every complete record and stop, not raise (strict=True keeps
    the raising behaviour)."""
    w = TfEventsWriter(str(tmp_path))
    w.add_scalar("a", 1.0, 1)
    w.add_scalar("b", 2.0, 2)
    w.close()
    data = open(w.path, "rb").read()
    for cut in (7, 20):
        trunc = str(tmp_path / f"trunc{cut}")
        with open(trunc, "wb") as fh:
            fh.write(data[:-cut])
        events = read_scalar_events(trunc)
        assert ("a", 1.0, 1) in events          # complete records survive
        with pytest.raises(ValueError):
            read_scalar_events(trunc, strict=True)


def test_runlogger_flushes_tb_per_add_scalars(tmp_path):
    from pigan_thz_tpu.utils.logging import RunLogger

    lg = RunLogger(str(tmp_path), name="t", stdout=False)
    lg.add_scalars({"loss": 0.5}, step=1)
    # file readable BEFORE close (the kill scenario)
    import glob, os
    f = glob.glob(os.path.join(lg.run_dir, "tb", "events.out.tfevents.*"))[0]
    assert ("loss", 0.5, 1) in read_scalar_events(f)
    lg.close()
