#!/usr/bin/env python
"""Convert an upstream PyTorch htdemucs checkpoint to an orbax checkpoint
for :mod:`amw_tpu.models.htdemucs_jax`.

Usage:
  python scripts/convert_htdemucs.py inspect ckpt.th
      — print the torch state-dict keys/shapes
  python scripts/convert_htdemucs.py convert ckpt.th out_dir/
      — convert and save an orbax checkpoint
  python scripts/convert_htdemucs.py selftest out_dir/
      — build a random torch oracle, convert, and verify JAX parity

The JAX forward consumes the upstream state-dict names and layouts directly
(see amw_tpu/models/htdemucs_jax.py), so conversion is a 1:1 tensor dump —
no renames or transposes.  Accepted checkpoint layouts: a raw state dict,
the demucs package format {'klass','args','kwargs','state'}, or a bag-of-
models file {'models': [...]} (first model taken).

Expected upstream sources for the released two-stem/four-stem models:
``htdemucs`` (955717e8-8726e21a.th) from the demucs v4 release — the
reference invokes it via the demucs CLI (services/vocal_isolation.py:23-41).
"""

import sys

sys.path.insert(0, ".")


def load_torch_state(path: str, return_kwargs: bool = False):
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "models" in blob:
        blob = blob["models"][0]
    # demucs remote checkpoints store {'klass','args','kwargs','state'};
    # training snapshots may carry 'best_state' (EMA) alongside 'state' —
    # skip falsy entries (best_state=None before the first best update).
    # The embedded kwargs describe the architecture variant (e.g. 6-stem
    # htdemucs_6s) and drive HTConfig derivation at convert time.
    kwargs = (dict(blob.get("kwargs") or {})
              if isinstance(blob, dict) else {})
    for key in ("best_state", "state", "state_dict"):
        if isinstance(blob, dict) and blob.get(key):
            blob = blob[key]
            break
    if hasattr(blob, "state_dict"):
        blob = blob.state_dict()
    if not isinstance(blob, dict):
        raise SystemExit("unrecognized checkpoint layout")
    out = {}
    for k, v in blob.items():
        if not hasattr(v, "shape"):
            continue
        # strip DataParallel/compile wrappers (possibly nested, any order);
        # cast half/bf16 to f32
        while True:
            for pre in ("module.", "_orig_mod."):
                if k.startswith(pre):
                    k = k[len(pre):]
                    break
            else:
                break
        out[k] = v.float() if hasattr(v, "float") else v
    if return_kwargs:
        return out, kwargs
    return out


def cmd_inspect(path: str) -> int:
    state = load_torch_state(path)
    for k, v in state.items():
        print(f"{k:64s} {tuple(v.shape)}")
    print(f"\n{len(state)} tensors")
    return 0


EXPECTED_PREFIXES = (
    "encoder.", "tencoder.", "decoder.", "tdecoder.", "freq_emb.",
    "channel_upsampler", "channel_downsampler", "crosstransformer.",
)


def cmd_convert(path: str, out_dir: str) -> int:
    from amw_tpu.models.htdemucs_jax import (
        HTConfig, check_params_shape, config_from_kwargs,
        params_from_torch_state, save_params)

    state, kwargs = load_torch_state(path, return_kwargs=True)
    params = params_from_torch_state(state)
    unknown = [k for k in params if not k.startswith(EXPECTED_PREFIXES)]
    if unknown:
        print(f"WARNING: {len(unknown)} tensors outside the known module "
              f"tree (kept as-is): {unknown[:8]}{'…' if len(unknown) > 8 else ''}")
    # Stamp the checkpoint with the variant's true architecture: derived
    # from the demucs package format's embedded kwargs when present, else
    # the released 4-stem default — and verified against the tensor shapes
    # so a mis-stamped config fails HERE, not later inside forward().
    cfg = config_from_kwargs(kwargs) if kwargs else HTConfig()
    check_params_shape(params, cfg)
    import os

    out_dir = os.path.abspath(out_dir)  # orbax requires absolute paths
    save_params(params, out_dir, cfg)
    print(f"saved {len(params)} tensors to orbax checkpoint {out_dir} "
          f"({len(cfg.sources)} sources, {cfg.audio_channels} ch, "
          f"channels={cfg.channels}, nfft={cfg.nfft})")
    return 0


def cmd_selftest(out_dir: str) -> int:
    """Random-weights end-to-end check of the conversion path: torch oracle →
    orbax → jax forward parity (same assertion as tests/test_htdemucs_parity)."""
    import numpy as np
    import torch
    import jax
    import jax.numpy as jnp

    from amw_tpu.models import htdemucs_jax as hj
    from amw_tpu.models.htdemucs_torch import HTDemucsTorch

    # The selftest asserts f32 parity against the torch oracle — pin the
    # module dtype so a TPU host's "auto" (bf16) mode can't skew it.
    hj._DTYPE = "f32"
    cfg = hj.tiny_config()
    torch.manual_seed(0)
    model = HTDemucsTorch(cfg).eval()
    params = hj.params_from_torch_state(model.state_dict())
    hj.save_params(params, out_dir, cfg)
    cfg2, restored = hj.load_params(out_dir)
    assert cfg2.nfft == cfg.nfft and cfg2.t_heads == cfg.t_heads
    mix = torch.randn(1, 2, cfg.segment_samples)
    with torch.no_grad():
        y_t = model(mix).numpy()
    y_j = np.asarray(jax.jit(lambda p, x: hj.forward(p, x, cfg2))(
        jax.device_put(dict(restored)), jnp.asarray(mix.numpy())))
    err = float(np.abs(y_t - y_j).max())
    print(f"parity max err: {err:.2e}")
    assert err < 2e-3, "conversion parity failed"
    print("selftest OK")
    return 0


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    cmd = sys.argv[1]
    if cmd == "inspect":
        return cmd_inspect(sys.argv[2])
    if cmd == "convert":
        if len(sys.argv) < 4:
            print("convert needs: ckpt.th out_dir/")
            return 2
        return cmd_convert(sys.argv[2], sys.argv[3])
    if cmd == "selftest":
        return cmd_selftest(sys.argv[2])
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
