"""Foreground-mask extraction for captured scenes (BiRefNet).

Behavioral reference: /root/reference/scripts/mask.py — runs BiRefNet-HR over
<source>/images and writes <source>/masks/<stem>.png. BiRefNet's code and
pretrained weights are NOT bundled in this environment (external repo +
~900MB checkpoint); this wrapper is gated on both being supplied.

Usage: python scripts/mask.py -s <source_path> --weights <BiRefNet.pth> \
           --birefnet_repo <path-to-birefnet-checkout>
"""
from __future__ import annotations

import os
import sys
from argparse import ArgumentParser
from pathlib import Path


def main():
    p = ArgumentParser()
    p.add_argument("--source_path", "-s", required=True)
    p.add_argument("--images", default="images")
    p.add_argument("--out", default="masks")
    p.add_argument("--weights", required=True,
                   help="BiRefNet-HR checkpoint (.pth)")
    p.add_argument("--birefnet_repo", required=True,
                   help="path to a BiRefNet source checkout")
    p.add_argument("--size", type=int, default=1024)
    args = p.parse_args()

    if not os.path.exists(args.weights):
        sys.exit(f"[!] weights not found: {args.weights}")
    sys.path.insert(0, args.birefnet_repo)
    try:
        import torch
        from birefnet.models.birefnet import BiRefNet
        from birefnet.utils import check_state_dict
    except ImportError as e:
        sys.exit(f"[!] BiRefNet import failed ({e}); pass --birefnet_repo "
                 "pointing at https://github.com/ZhengPeng7/BiRefNet")

    from PIL import Image
    import numpy as np

    net = BiRefNet(bb_pretrained=False)
    sd = check_state_dict(torch.load(args.weights, map_location="cpu"))
    net.load_state_dict(sd)
    net.eval()

    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    img_dir = Path(args.source_path) / args.images
    out_dir = Path(args.source_path) / args.out
    out_dir.mkdir(exist_ok=True)

    for path in sorted(img_dir.iterdir()):
        if path.suffix.lower() not in (".png", ".jpg", ".jpeg"):
            continue
        img = Image.open(path).convert("RGB")
        orig = img.size
        x = np.asarray(img.resize((args.size, args.size)), np.float32) / 255.0
        x = (x - mean) / std
        t = torch.from_numpy(x.transpose(2, 0, 1))[None]
        with torch.no_grad():
            pred = net(t)[-1].sigmoid()[0, 0].numpy()
        m = Image.fromarray((pred * 255).astype(np.uint8)).resize(orig)
        m.save(out_dir / f"{path.stem}.png")
        print(f"[>] {path.name}")
    print(f"[>] masks -> {out_dir}")


if __name__ == "__main__":
    main()
