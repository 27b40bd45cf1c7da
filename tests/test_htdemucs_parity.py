"""htdemucs conversion parity: the JAX forward must match the PyTorch oracle
sample-for-sample on the same weights.

The torch oracle (amw_tpu.models.htdemucs_torch) reproduces the upstream
``demucs`` v4 module tree, so this test is the offline guarantee that a
converted upstream checkpoint produces the same stems on TPU as the
reference's Demucs subprocess (reference: services/vocal_isolation.py:13-63).
Runs at a tiny config (same topology) to keep CI fast.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from amw_tpu.models import htdemucs_jax as hj  # noqa: E402
from amw_tpu.models.htdemucs_torch import (  # noqa: E402
    HTDemucsTorch, _spec as t_spec, _ispec as t_ispec, spectro)


@pytest.fixture(scope="module")
def tiny():
    torch.manual_seed(0)
    cfg = hj.tiny_config()
    model = HTDemucsTorch(cfg).eval()
    params = hj.params_from_torch_state(model.state_dict())
    return cfg, model, params


def test_stft_matches_torch(tiny):
    cfg, _, _ = tiny
    x = torch.randn(2, 3000)
    re_t, im_t = (z.numpy() for z in
                  (t_spec(x, cfg.nfft, cfg.hop).real,
                   t_spec(x, cfg.nfft, cfg.hop).imag))
    re_j, im_j = hj._spec(jnp.asarray(x.numpy()), cfg.nfft, cfg.hop)
    np.testing.assert_allclose(np.asarray(re_j), re_t, atol=2e-5)
    np.testing.assert_allclose(np.asarray(im_j), im_t, atol=2e-5)


def test_istft_matches_torch(tiny):
    cfg, _, _ = tiny
    x = torch.randn(2, 3000)
    z = t_spec(x, cfg.nfft, cfg.hop)
    y_t = t_ispec(z, cfg.hop, 3000).numpy()
    y_j = hj._ispec(jnp.asarray(z.real.numpy()), jnp.asarray(z.imag.numpy()),
                    cfg.hop, 3000)
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=2e-5)


def test_conv_transpose_matches_torch():
    torch.manual_seed(1)
    ct = torch.nn.ConvTranspose1d(6, 4, 8, 4)
    x = torch.randn(2, 6, 10)
    y_t = ct(x).detach().numpy()
    y_j = hj.conv_transpose1d(jnp.asarray(x.numpy()),
                              jnp.asarray(ct.weight.detach().numpy()),
                              jnp.asarray(ct.bias.detach().numpy()), 4)
    np.testing.assert_allclose(np.asarray(y_j), y_t, atol=1e-5)
    ct2 = torch.nn.ConvTranspose2d(6, 4, (8, 1), (4, 1))
    x2 = torch.randn(2, 6, 10, 3)
    y2_t = ct2(x2).detach().numpy()
    y2_j = hj.conv_transpose2d(jnp.asarray(x2.numpy()),
                               jnp.asarray(ct2.weight.detach().numpy()),
                               jnp.asarray(ct2.bias.detach().numpy()), (4, 1))
    np.testing.assert_allclose(np.asarray(y2_j), y2_t, atol=1e-5)


def test_forward_parity(tiny):
    """Full model: torch forward == jax forward on the same random weights."""
    cfg, model, params = tiny
    torch.manual_seed(2)
    mix = torch.randn(1, 2, cfg.segment_samples)
    with torch.no_grad():
        y_t = model(mix).numpy()
    y_j = np.asarray(jax.jit(lambda p, x: hj.forward(p, x, cfg))(
        jax.device_put(params), jnp.asarray(mix.numpy())))
    assert y_t.shape == y_j.shape == (1, 4, 2, cfg.segment_samples)
    scale = np.abs(y_t).max()
    err = np.abs(y_t - y_j).max()
    assert err < 2e-3 * max(scale, 1.0), f"parity err {err} (scale {scale})"


def test_bf16_mode_close_to_f32(tiny, monkeypatch):
    """AMW_HTDEMUCS_DTYPE=bf16 (inference_params + bf16 activations) must
    stay close to the f32 forward: norms/softmax/STFT remain f32, so the
    error is bf16 activation rounding only — gate the stems at ≥ 30 dB SNR
    vs the f32 output (separation quality is unaffected at that level)."""
    cfg, _, params = tiny
    rng = np.random.default_rng(7)
    mix = (rng.standard_normal((1, 2, cfg.segment_samples)) * 0.2
           ).astype(np.float32)
    y32 = np.asarray(jax.jit(lambda p, x: hj.forward(p, x, cfg))(
        jax.device_put(params), jnp.asarray(mix)))
    monkeypatch.setattr(hj, "_DTYPE", "bf16")
    p16 = jax.device_put(hj.inference_params(params))
    assert any(v.dtype == jnp.bfloat16 for v in p16.values())
    y16 = np.asarray(jax.jit(lambda p, x: hj.forward(p, x, cfg))(
        p16, jnp.asarray(mix)).astype(jnp.float32))
    assert y16.dtype == np.float32 and np.all(np.isfinite(y16))
    snr = 10 * np.log10(np.sum(y32 ** 2) / max(np.sum((y32 - y16) ** 2),
                                               1e-20))
    assert snr > 30.0, f"bf16 SNR {snr:.1f} dB"


def test_separate_segments(tiny):
    """separate(): overlapping segmented inference reconstructs ~the same
    stems as one full-length forward."""
    cfg, model, params = tiny
    rng = np.random.default_rng(3)
    T = int(cfg.segment_samples * 1.7)
    mix = rng.standard_normal((2, T)).astype(np.float32) * 0.2
    stems = hj.separate(params, mix, cfg)
    assert stems.shape == (4, 2, T)
    assert np.all(np.isfinite(stems))
    # stems sum should roughly reconstruct the mix only for trained weights;
    # for random weights just check the segmentation produced smooth output
    # (no NaN, bounded amplitude).
    assert np.abs(stems).max() < 100.0


def test_separate_device_matches_host_oa(tiny):
    """The device-resident overlap-add (mix uploaded once, gather/forward/
    triangle accumulate on device, one fetch) == the host-side accumulation
    loop, including tail-segment cropping and stem selection."""
    cfg, _, params = tiny
    rng = np.random.default_rng(9)
    # T = 4.5 segments at batch=2 exercises the multi-window scan (6
    # segments -> nb=3 windows -> nb_b=4 bucket): i>0 window offsets,
    # cross-window accumulation of overlapping contributions, AND an
    # all-padding window skipped via valid=0.
    for T, batch in ((int(cfg.segment_samples * 2.3), 3),
                     (cfg.segment_samples // 2, 3),
                     (int(cfg.segment_samples * 4.5), 2)):
        mix = rng.standard_normal((2, T)).astype(np.float32) * 0.2
        for stems in (None, ("vocals",)):
            nb_b = hj.oa_plan(cfg, T, batch=batch)[3]
            dev = hj.separate(params, mix, cfg, batch=batch, stems=stems)
            host = hj.separate(params, mix, cfg, batch=batch, stems=stems,
                               host_oa=True)
            assert dev.shape == host.shape
            scale = max(np.abs(host).max(), 1e-6)
            err = np.abs(dev - host).max() / scale
            assert err < 1e-4, (T, stems, nb_b, err)


def test_separate_int16_transfer_lossless(tiny):
    """A mix on the int16 grid (i.e. decoded from 16-bit PCM) rides the
    compressed int16 host→device transfer and must produce EXACTLY the
    stems of the f32 path (the dequant is bit-exact); a non-grid mix must
    not be quantized by the optimization."""
    cfg, _, params = tiny
    rng = np.random.default_rng(11)
    T = int(cfg.segment_samples * 1.4)
    mix = rng.standard_normal((2, T)).astype(np.float32) * 0.2
    grid = np.round(mix * 32768.0).clip(-32767, 32767) \
        .astype(np.float32) / np.float32(32768.0)
    out_grid = hj.separate(params, grid, cfg)
    # Same samples shipped as explicit f32 (break grid exactness with a
    # sub-LSB offset on one sample only, far below any model sensitivity —
    # forces the f32 transfer branch).
    off = grid.copy()
    off[0, 0] += np.float32(1e-9)
    out_f32 = hj.separate(params, off, cfg)
    assert np.allclose(out_grid, out_f32, atol=1e-5)
    # and a float-valued mix keeps bitwise-f32 behavior vs host oracle
    out_dev = hj.separate(params, mix, cfg)
    out_host = hj.separate(params, mix, cfg, host_oa=True)
    scale = max(np.abs(out_host).max(), 1e-6)
    assert np.abs(out_dev - out_host).max() / scale < 1e-4


def test_orbax_roundtrip(tiny, tmp_path):
    cfg, _, params = tiny
    path = str(tmp_path / "ckpt")
    hj.save_params(params, path, cfg)
    cfg2, restored = hj.load_params(path)
    assert set(restored.keys()) == set(params.keys())
    assert (cfg2.nfft, cfg2.t_heads, cfg2.channels) == (
        cfg.nfft, cfg.t_heads, cfg.channels)
    k = "encoder.0.conv.weight"
    np.testing.assert_array_equal(np.asarray(restored[k]), params[k])


def test_vocal_isolation_uses_htdemucs_checkpoint(tiny, tmp_path,
                                                  monkeypatch):
    """End-to-end: a configured converted checkpoint makes the vocal
    isolation service path run the neural separator (reference behavior:
    services/vocal_isolation.py uses demucs htdemucs)."""
    import amw_tpu.models.vocal as vocal

    cfg, _, params = tiny
    path = str(tmp_path / "ckpt2")
    hj.save_params(params, path, cfg)
    monkeypatch.setenv("AMW_HTDEMUCS_CKPT", path)
    monkeypatch.setattr(vocal, "_ht_cache", vocal._HT_SENTINEL)
    rng = np.random.default_rng(0)
    audio = (0.2 * rng.standard_normal((2, 12000))).astype(np.float32)
    vocals = vocal.isolate_vocal(audio, 8000)
    assert vocals.shape == audio.shape
    assert np.all(np.isfinite(vocals))
    # the neural path was actually taken
    assert vocal._ht_cache is not None and vocal._ht_cache is not vocal._HT_SENTINEL
    direct = vocal.separate_htdemucs(audio, 8000)
    np.testing.assert_allclose(vocals, direct, atol=1e-6)


def test_upstream_key_compatibility(tiny):
    """The oracle's state-dict keys follow the upstream naming scheme the
    converter maps (spot checks against demucs v4's tree)."""
    _, model, _ = tiny
    keys = set(model.state_dict().keys())
    for expected in [
        "encoder.0.conv.weight", "encoder.3.rewrite.bias",
        "encoder.1.dconv.layers.0.0.weight",
        "encoder.1.dconv.layers.1.6.scale",
        "tencoder.0.conv.weight", "tdecoder.3.conv_tr.weight",
        "decoder.0.rewrite.weight", "freq_emb.embedding.weight",
        "channel_upsampler.weight", "channel_downsampler_t.bias",
        "crosstransformer.norm_in.weight",
        "crosstransformer.layers.0.self_attn.in_proj_weight",
        "crosstransformer.layers.1.cross_attn.out_proj.weight",
        "crosstransformer.layers_t.2.gamma_2.scale",
        "crosstransformer.layers_t.1.norm3.bias",
        "crosstransformer.layers.0.norm_out.weight",
    ]:
        assert expected in keys, expected


def test_bundled_checkpoint_genuinely_separates():
    """The committed tiny checkpoint (models/checkpoints/htdemucs_tiny) is
    genuinely TRAINED, not random: on a fresh synthetic mixture from the
    legacy recipe (held-out seed), the predicted vocals stem beats the
    mixture-as-estimate baseline by a wide margin.  The round-5 TPU-trained
    checkpoint (scripts/train_htdemucs_tpu.py) measured 9.4 dB here
    (baseline −5.2) and 6.5 dB on the generator-INDEPENDENT corpus
    (scripts/gen_sep_eval.py, recorded per-run in bench as
    htdemucs_vocal_snr_heldout_db)."""
    import importlib.util
    import pathlib

    import jax
    import jax.numpy as jnp

    from amw_tpu.models import htdemucs_jax as hj
    from amw_tpu.models.vocal import htdemucs_checkpoint_path

    root = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "train_htdemucs_tiny", root / "scripts" / "train_htdemucs_tiny.py")
    train_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train_mod)

    import os

    os.environ["AMW_HTDEMUCS_CKPT"] = "bundled"
    try:
        cfg, params = hj.load_params(htdemucs_checkpoint_path())
    finally:
        os.environ.pop("AMW_HTDEMUCS_CKPT", None)
    rng = np.random.default_rng(987654)  # not the training or eval seed
    stems = train_mod.synth_batch(rng, 4, cfg.segment_samples, cfg.samplerate)
    mix = stems.sum(axis=1).astype(np.float32)
    pred = np.asarray(jax.jit(lambda p, x: hj.forward(p, x, cfg))(
        jax.device_put(dict(params)), jnp.asarray(mix)))
    voc_true, voc_pred = stems[:, 3], pred[:, 3]

    def snr(est):
        return 10 * np.log10(np.sum(voc_true ** 2)
                             / max(np.sum((est - voc_true) ** 2), 1e-12))

    s_model, s_base = snr(voc_pred), snr(mix)
    assert s_model > s_base + 8.0, (s_model, s_base)
    # Absolute quality floor (VERDICT r3 item 5): the TPU-trained model
    # measured 9.4 dB here; gate below that so a silently degraded
    # checkpoint fails.  bench.py records the same number per-run as
    # htdemucs_vocal_snr_db.
    assert s_model > 8.0, s_model


def test_bundled_checkpoint_is_tpu_trained_shape():
    """Pin the bundled checkpoint's identity: the round-5 TPU-trained
    model is channels=16 / bottom_channels=48 (scripts/train_htdemucs_tpu
    .py defaults).  A silent downgrade to the round-4 8/24 CPU-trained
    checkpoint — which scores ~0 dB on the generator-independent corpus —
    fails here without paying a forward pass."""
    import os

    from amw_tpu.models import htdemucs_jax as hj
    from amw_tpu.models.vocal import htdemucs_checkpoint_path

    os.environ["AMW_HTDEMUCS_CKPT"] = "bundled"
    try:
        cfg, params = hj.load_params(htdemucs_checkpoint_path())
    finally:
        os.environ.pop("AMW_HTDEMUCS_CKPT", None)
    assert cfg.channels == 16 and cfg.bottom_channels == 48, cfg
    n_params = sum(int(np.prod(v.shape)) for v in params.values())
    assert n_params > 1_000_000, n_params


def test_released_shape_conversion_dry_run(tmp_path):
    """Full released-shape conversion dry-run (VERDICT r3 item 5): a
    synthetic state dict in the demucs package format at the REAL htdemucs
    dimensions (4 stems, channels=48, nfft=4096, bottom=512, 5 transformer
    layers) goes through scripts/convert_htdemucs.py's convert entry, the
    orbax checkpoint loads, and one forward runs — so the first time a
    real 955717e8 checkpoint is available, every step after ``torch.load``
    is already proven at released shape."""
    import importlib.util
    import pathlib

    import jax
    import jax.numpy as jnp

    from amw_tpu.models.htdemucs_torch import HTDemucsTorch

    root = pathlib.Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "convert_htdemucs", root / "scripts" / "convert_htdemucs.py")
    conv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(conv)

    cfg = hj.HTConfig()  # released defaults
    torch.manual_seed(1)
    model = HTDemucsTorch(cfg).eval()
    blob = {
        "klass": "HTDemucs",
        "args": [],
        "kwargs": {"sources": list(cfg.sources), "audio_channels": 2,
                   "channels": cfg.channels, "nfft": cfg.nfft,
                   "bottom_channels": cfg.bottom_channels,
                   "t_layers": cfg.t_layers, "t_heads": cfg.t_heads,
                   "segment": cfg.segment, "samplerate": cfg.samplerate},
        "state": model.state_dict(),
    }
    ckpt = tmp_path / "synthetic_released.th"
    torch.save(blob, ckpt)
    del model, blob

    out_dir = tmp_path / "converted"
    assert conv.cmd_convert(str(ckpt), str(out_dir)) == 0

    cfg2, params = hj.load_params(str(out_dir))
    assert len(cfg2.sources) == 4 and cfg2.channels == 48
    assert cfg2.nfft == 4096 and cfg2.bottom_channels == 512
    # One forward at released shape (short hop-aligned input keeps the CPU
    # cost reasonable; the architecture is length-flexible).
    T = cfg2.hop * 64
    mix = jnp.asarray(0.05 * np.random.default_rng(0)
                      .standard_normal((1, 2, T)).astype(np.float32))
    out = np.asarray(jax.jit(lambda p, x: hj.forward(p, x, cfg2))(
        jax.device_put(dict(params)), mix))
    assert out.shape == (1, 4, 2, T)
    assert np.all(np.isfinite(out))
