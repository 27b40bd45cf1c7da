"""Regression-by-windows: the default chain must not blow up HF content or
introduce sample discontinuities (mirrors
tests/test_mastering_regression_windows.py in the reference)."""

import numpy as np
import pytest

from amw_tpu.qa import mastering_regression as mr

SR = 44100


def _synthetic_noise(dur_sec=48.0, sr=SR, seed=5):
    g = np.random.default_rng(seed)
    n = int(dur_sec * sr)
    t = np.arange(n) / sr
    base = 0.2 * np.sin(2 * np.pi * 180 * t) + 0.05 * g.standard_normal(n)
    x = np.clip(base, -1, 1).astype(np.float32)
    return np.stack([x, 0.9 * x])


WINDOWS = (("intro", 2.0, 10.0), ("mid", 20.0, 35.0), ("late", 40.0, 46.0))


@pytest.fixture(scope="module")
def stage_rows():
    audio = _synthetic_noise()
    return audio, mr.metrics_after_each_stage(audio, SR, WINDOWS)


def test_stage_list_complete(stage_rows):
    _, rows = stage_rows
    ids = [r["stage"] for r in rows]
    assert ids[0] in ("dc_offset", "dc_offset+peak_guard")
    assert ids[-2:] == ["chain_finalize_clip", "v2_output_fade_in"]
    # stages may appear fused with adjacent LTI stages (ops.fused)
    assert any("dynamics" in s for s in ids)
    assert any(s == "normalize_lufs" or s.startswith("normalize_lufs+")
               for s in ids)


def test_hf_not_blown_up(stage_rows):
    audio, rows = stage_rows
    in_metrics = mr.window_metrics(audio, SR, WINDOWS)
    out_metrics = rows[-1]["windows"]
    for name in out_metrics:
        hf_in = max(in_metrics[name]["hf_rms"], 1e-9)
        ratio = out_metrics[name]["hf_rms"] / hf_in
        assert ratio < 80.0, (name, ratio)


def test_no_sample_discontinuities(stage_rows):
    _, rows = stage_rows
    for row in rows:
        for name, m in row["windows"].items():
            assert m["max_abs_diff"] < 1.5, (row["stage"], name, m)


def test_output_rms_reasonable(stage_rows):
    _, rows = stage_rows
    final = rows[-1]["windows"]
    for name, m in final.items():
        assert 1e-4 < m["rms"] < 1.0, (name, m)


def _ensure_fixture():
    """The fixture WAV is deterministic (seeded, no dither) and reproducible
    from scripts/gen_regression_fixture.py, so the 29 MB blob itself is not
    committed — regenerate on demand (doc: MASTERING_REGRESSION.md)."""
    p = mr.regression_wav_path()
    if p is not None:
        return p
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    subprocess.run([sys.executable, "scripts/gen_regression_fixture.py"],
                   cwd=root, check=True, timeout=300)
    p = mr.regression_wav_path()
    assert p is not None, "fixture generation failed"
    return p


def test_real_wav_fixture():
    from amw_tpu.utils import wav as wavmod

    p = _ensure_fixture()
    audio, sr = wavmod.read_wav(p.read_bytes())
    rows = mr.metrics_after_each_stage(audio, sr)
    thresholds = mr.load_expected_thresholds() or {}
    hf_limit = float(thresholds.get("hf_ratio_limit", 35.0))
    in_m = mr.window_metrics(audio, sr)
    out_m = rows[-1]["windows"]
    for name in out_m:
        hf_in = max(in_m[name]["hf_rms"], 1e-9)
        assert out_m[name]["hf_rms"] / hf_in < hf_limit
        assert out_m[name]["max_abs_diff"] < float(
            thresholds.get("max_abs_diff_limit", 0.95))


def test_trace_subsystem_emits(caplog, monkeypatch):
    import logging
    from amw_tpu.utils import trace

    monkeypatch.setenv("MAGIC_MASTER_MASTERING_TRACE", "1")
    ctx = trace.TraceContext.build("job-1", "t.wav", "v2", style="edm",
                                  target_lufs=-14.0,
                                  pro_params={"rumble_enabled": True})
    with caplog.at_level(logging.INFO, logger="amw_tpu.mastering_trace"):
        trace.logger.propagate = True
        trace.trace_job_start(ctx)
        x = np.zeros((2, 1000), np.float32)
        trace.trace_stage(ctx, "dc_offset", x, 44100)
        trace.trace_job_done(ctx, out_format="wav")
        trace.logger.propagate = False
    text = caplog.text
    assert "job_id=job-1" in text
    assert "stage=dc_offset" in text
    assert "event=job_done" in text
    assert "rumble_enabled=True" in text
