#!/usr/bin/env python
"""Convert an upstream PyTorch htdemucs checkpoint to an orbax checkpoint
for :mod:`amw_tpu.models.htdemucs_jax`.

Usage:
  python scripts/convert_htdemucs.py inspect ckpt.th
      — print the torch state-dict keys/shapes (to build/verify the mapping)
  python scripts/convert_htdemucs.py convert ckpt.th out_dir/
      — map weights and save an orbax checkpoint

The in-tree model is an htdemucs-CLASS architecture, not a parameter-
identical clone of the upstream module tree, so conversion requires the
explicit name map below.  `inspect` output + `init_params()` tree paths are
the two sides to line up; unmapped tensors are reported rather than
silently dropped.  (This environment has no network access and ships no
demucs checkpoint, so the map is a scaffold to be completed against a real
file; the DSP separator in models/vocal.py remains the production path
until then.)
"""

import sys

sys.path.insert(0, ".")


def load_torch_state(path: str) -> dict:
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    # demucs checkpoints nest the state dict under 'state' or 'models'
    for key in ("state", "state_dict"):
        if isinstance(blob, dict) and key in blob:
            blob = blob[key]
            break
    if not isinstance(blob, dict):
        raise SystemExit("unrecognized checkpoint layout")
    return {k: v for k, v in blob.items() if hasattr(v, "shape")}


def cmd_inspect(path: str) -> int:
    state = load_torch_state(path)
    for k, v in state.items():
        print(f"{k:60s} {tuple(v.shape)}")
    print(f"\n{len(state)} tensors")
    return 0


def cmd_convert(path: str, out_dir: str) -> int:
    import numpy as np
    import jax

    from amw_tpu.models.htdemucs_jax import init_params

    state = load_torch_state(path)
    model, params = init_params()
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    print(f"target model has {len(flat)} parameter tensors")

    # --- name mapping (complete against `inspect` output) -----------------
    # upstream prefix -> (flax module path fragment, transpose spec)
    NAME_MAP: dict[str, str] = {
        # "encoder.0.conv.weight": "EncLayer_0/Conv_0/kernel",
        # ...
    }
    if not NAME_MAP:
        print("NAME_MAP is empty — run `inspect` and fill the mapping "
              "before converting.  Saving randomly-initialized params so "
              "the orbax pipeline itself can be exercised.")
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(out_dir, jax.tree_util.tree_map(np.asarray, params), force=True)
    print(f"saved orbax checkpoint to {out_dir}")
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
    print(__doc__)
    return 2


if __name__ == "__main__":
    sys.exit(main())
