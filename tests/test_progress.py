"""Per-stage SSE progress (reference: ~17 stage updates per job,
routers/mastering.py:1472 + pipeline.py:1834-1907)."""

import numpy as np

from amw_tpu.runtime import progress as prog_mod


def _track(sr, n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
    return np.stack([x, 0.8 * x])


def test_callbacks_supported_on_cpu():
    assert prog_mod.callbacks_supported() is True


def test_engine_emits_stage_progress():
    from amw_tpu.runtime.engine import MasteringEngine
    from amw_tpu.utils import wav

    sr = 22050
    n = sr * 2  # < MIN_BUCKET_SEC: exact-length graph, fast compile
    data = wav.write_wav_float32(_track(sr, n), sr)
    events = []
    eng = MasteringEngine(bucket=True, micro_batch=False)
    res = eng.master_v2_bytes(
        data, "t.wav", target_lufs=-14.0,
        pro={"deesser_enabled": True, "parallel_mix": 0.2},
        progress=lambda pct, msg: events.append((pct, msg)))
    assert res["bytes"][:4] == b"RIFF"
    stage_events = [e for e in events if e[1].startswith("Mastering: ")]
    labels = {e[1] for e in stage_events}
    assert len(labels) >= 8, f"only {len(labels)} distinct stage labels: {labels}"
    # progress is monotonic and stage labels are real stage names
    pcts = [e[0] for e in events]
    assert pcts == sorted(pcts)
    assert any("chain:" in l or "deesser" in l or "dynamics" in l
               for l in labels)


def test_timed_ticker_interpolates():
    import time

    events = []
    names = [f"s{i}" for i in range(10)]
    with prog_mod.TimedTicker(names, lambda p, m: events.append((p, m)),
                              expected_sec=0.6, interval=0.05):
        # Gate on observed ticks, not elapsed wall time: under CI load the
        # ticker thread may fire late, but each tick emits every stage it
        # passed, so one late tick is enough to catch the labels up.
        deadline = time.monotonic() + 6.0
        while (len({m for _, m in events}) < 5
               and time.monotonic() < deadline):
            time.sleep(0.05)
    labels = {m for _, m in events}
    assert len(labels) >= 5
    assert all("(est)" in m for m in labels)
    # catch-up emission keeps the label sequence gap-free and ordered
    import re

    idx = [int(re.search(r": s(\d+) ", m).group(1)) for _, m in events]
    assert idx == sorted(idx)
    assert idx == list(range(min(idx), max(idx) + 1))


def test_registry_tick_ordering():
    events = []
    tok = prog_mod.register(["a", "b", "c"], lambda p, m: events.append((p, m)))
    prog_mod.emit_stage_tick(tok, 1)
    prog_mod.emit_stage_tick(tok, 0)  # out-of-order: must be ignored
    prog_mod.emit_stage_tick(tok, 2)
    prog_mod.unregister(tok)
    prog_mod.emit_stage_tick(tok, 2)  # after unregister: no-op
    assert [m for _, m in events] == ["Mastering: b", "Mastering: c"]
