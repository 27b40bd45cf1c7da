#!/usr/bin/env python
"""Full component checklist (reference: backend/run_debug.py — 8-section
operator diagnostic).  Exercises every DSP op, the chain runtime, the
meters, I/O, persistence, and the service wiring; prints PASS/FAIL lines.
"""

import sys
import traceback

import numpy as np

sys.path.insert(0, ".")

RESULTS = []


def check(name):
    def deco(fn):
        def run():
            try:
                fn()
                RESULTS.append((name, True, ""))
                print(f"  [PASS] {name}")
            except Exception as e:  # noqa: BLE001
                RESULTS.append((name, False, str(e)))
                print(f"  [FAIL] {name}: {e}")
                traceback.print_exc(limit=1)
        return run
    return deco


def _mix(sr=44100, dur=2.0):
    g = np.random.default_rng(0)
    t = np.arange(int(sr * dur)) / sr
    x = (0.3 * np.sin(2 * np.pi * 220 * t) + 0.03 * g.standard_normal(len(t)))
    return np.clip(np.stack([x, 0.8 * x]), -1, 1).astype(np.float32)


def main() -> int:
    sr = 44100
    mix = _mix(sr)

    print("1) environment")

    @check("jax devices")
    def _c1():
        import jax

        assert len(jax.devices()) >= 1

    _c1()

    print("2) meters")

    @check("BS.1770 integrated + normalize + true peak")
    def _c2():
        from amw_tpu import refimpl

        lufs = refimpl.integrated_lufs(mix, sr)
        assert -60 < lufs < 0
        out = refimpl.normalize_lufs(mix, sr, -14.0)
        assert abs(refimpl.integrated_lufs(out, sr) + 14.0) < 0.2
        assert refimpl.true_peak_dbfs(mix, sr) < 3.0

    _c2()

    print("3) DSP ops (TPU graph vs oracle)")

    def op_check(name, build, ref_fn, tol=1e-4, *args, **kw):
        @check(name)
        def _c():
            import jax
            import jax.numpy as jnp

            from amw_tpu.spec import GraphSpec

            spec = GraphSpec(sr=sr, n=mix.shape[-1], channels=2)
            params, fn = build(spec, *args, **kw)
            got = np.asarray(fn(jnp.asarray(mix), jax.device_put(params)))
            want = ref_fn(mix, sr, *args, **kw)
            err = float(np.max(np.abs(got.astype(np.float64) - want)))
            assert err < tol, f"err {err}"
        _c()

    from amw_tpu import refimpl
    from amw_tpu.ops.bands import build_dynamics
    from amw_tpu.ops.dynamics import build_deesser, build_dynamic_eq
    from amw_tpu.ops.eq import (build_final_spectral_balance, build_rumble_filter,
                                build_style_eq, build_target_curve)

    op_check("target_curve", build_target_curve,
             lambda x, s: refimpl.target_curve(x, s))
    op_check("dynamics", build_dynamics, lambda x, s: refimpl.dynamics(x, s))
    op_check("deesser", build_deesser, lambda x, s: refimpl.deesser(x, s))
    op_check("style_eq(edm)", lambda sp: build_style_eq(sp, "edm"),
             lambda x, s: refimpl.style_eq(x, s, "edm"))
    op_check("final_spectral_balance", build_final_spectral_balance,
             lambda x, s: refimpl.final_spectral_balance(x, s))
    op_check("rumble_filter", build_rumble_filter,
             lambda x, s: refimpl.rumble_filter(x, s))
    op_check("dynamic_eq", build_dynamic_eq,
             lambda x, s: refimpl.dynamic_eq(x, s), 3e-4)

    print("4) chain runtime")

    @check("default chain LUFS within ±2.5 of target")
    def _c4():
        from amw_tpu.models import compile_chain
        from amw_tpu.spec import GraphSpec

        spec = GraphSpec(sr=sr, n=mix.shape[-1], channels=2)
        out = compile_chain(spec, target_lufs=-14.0)(mix)
        lufs = refimpl.integrated_lufs(out, sr)
        assert abs(lufs + 14.0) < 2.5, lufs

    _c4()

    print("5) v1 pipeline")

    @check("v1 pipeline parity vs oracle")
    def _c5():
        from amw_tpu.models.pipeline_v1 import master_v1

        got = master_v1(mix, sr)
        want = refimpl.v1_pipeline(mix, sr)
        assert np.max(np.abs(got.astype(np.float64) - want)) < 2e-3

    _c5()

    print("6) I/O + export")

    @check("WAV roundtrip + dithered export")
    def _c6():
        from amw_tpu.utils import wav
        from amw_tpu.utils.audio_io import export_audio

        blob = export_audio(mix, sr, "wav")
        back, got_sr = wav.read_wav(blob)
        assert got_sr == sr and back.shape == mix.shape

    _c6()

    print("7) persistence")

    @check("sqlite schema + settings store")
    def _c7():
        import tempfile

        from amw_tpu.runtime import db, settings_store

        tmp = tempfile.NamedTemporaryFile(suffix=".sqlite3")
        db.set_db_path(tmp.name)
        settings_store.set_setting("probe", "1")
        assert settings_store.get_setting_int("probe", 0) == 1

    _c7()

    print("8) analysis")

    @check("analyze dict + lufs tool")
    def _c8():
        from amw_tpu.models.analyze import analyze, lufs_analyze_tool

        out = analyze(mix, sr, extended=True)
        assert len(out["spectrum_bars"]) == 64
        tool = lufs_analyze_tool(mix, sr)
        assert "spotify_ready" in tool

    _c8()

    fails = [r for r in RESULTS if not r[1]]
    print(f"\n{len(RESULTS) - len(fails)}/{len(RESULTS)} checks passed")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
