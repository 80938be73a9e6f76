"""Convert torch LPIPS / VGG16 checkpoints to the npz `utils/lpips.py` loads.

The reference evaluates LPIPS with the lpipsPyTorch package
(/root/reference/lpipsPyTorch/modules/networks.py:1-95): torchvision VGG16
`features` convs + the LPIPS learned 1x1 linear heads. This environment has
zero egress, so the weights must be converted ONCE on a machine that has
them and shipped as a single npz:

  python scripts/convert_lpips.py \
      --vgg  ~/.cache/torch/hub/checkpoints/vgg16-397923af.pth \
      --lin  <site-packages>/lpips/weights/v0.1/vgg.pth \
      -o     lpips_vgg.npz

  python -m gs2m_tpu.apps.metrics -m <model> --lpips_weights lpips_vgg.npz
  # or: export GS2M_LPIPS_WEIGHTS=lpips_vgg.npz

Accepted inputs:
  --vgg  torchvision vgg16 state_dict (keys `features.N.weight/bias`; a
         full-model dict with `classifier.*` is fine, extras are ignored).
  --lin  LPIPS linear-head checkpoint (keys `lin{i}.model.1.weight`, shape
         (1, C, 1, 1)). Optional — without it `utils/lpips.py` falls back to
         uncalibrated channel means (a recorded deviation, not LPIPS-v0.1).
"""
from __future__ import annotations

import argparse

import numpy as np

# torchvision VGG16 `features` conv indices (pre-pool ReLU stages).
VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
N_STAGES = 5


def _load_state_dict(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            for k, v in obj.items()}


def convert(vgg_path: str, lin_path: str | None, out_path: str) -> dict:
    out = {}
    sd = _load_state_dict(vgg_path)
    for idx in VGG16_CONV_IDX:
        for leaf in ("weight", "bias"):
            key = f"features.{idx}.{leaf}"
            if key not in sd:
                raise KeyError(
                    f"{key} missing from {vgg_path} — expected a torchvision "
                    f"vgg16 state_dict (features.N.weight/bias layout)")
            out[key] = np.asarray(sd[key], np.float32)

    if lin_path:
        lin = _load_state_dict(lin_path)
        for i in range(N_STAGES):
            key = f"lin{i}.model.1.weight"
            if key not in lin:
                raise KeyError(
                    f"{key} missing from {lin_path} — expected the lpips "
                    f"package's v0.1 vgg head checkpoint")
            out[key] = np.asarray(lin[key], np.float32).reshape(-1)

    np.savez(out_path, **out)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--vgg", required=True,
                    help="torchvision vgg16 .pth (features.* convs)")
    ap.add_argument("--lin", default=None,
                    help="lpips v0.1 vgg head .pth (lin{i}.model.1.weight)")
    ap.add_argument("-o", "--out", required=True, help="output .npz")
    args = ap.parse_args(argv)
    out = convert(args.vgg, args.lin, args.out)
    n_params = sum(v.size for v in out.values())
    print(f"[>] wrote {args.out}: {len(out)} arrays, {n_params / 1e6:.1f}M "
          f"params, lin heads {'yes' if args.lin else 'NO (uncalibrated)'}")


if __name__ == "__main__":
    main()
