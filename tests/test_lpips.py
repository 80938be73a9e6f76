"""LPIPS module: structural test with synthetic VGG weights."""
import numpy as np
import pickle
import pytest

from gs2m_tpu.utils import lpips as lp


def make_fake_weights(path):
    rng = np.random.default_rng(0)
    w = {}
    cin = 3
    chans = {0: 64, 2: 64, 5: 128, 7: 128, 10: 256, 12: 256, 14: 256,
             17: 512, 19: 512, 21: 512, 24: 512, 26: 512, 28: 512}
    for idx, cout in chans.items():
        w[f"features.{idx}.weight"] = rng.normal(
            scale=0.05, size=(cout, cin, 3, 3)).astype(np.float32)
        w[f"features.{idx}.bias"] = np.zeros(cout, np.float32)
        cin = cout
    for i, c in enumerate([64, 128, 256, 512, 512]):
        w[f"lin{i}.model.1.weight"] = rng.uniform(0, 1, c).astype(np.float32)
    with open(path, "wb") as f:
        pickle.dump(w, f)


def test_lpips_gated_without_weights():
    with pytest.raises(FileNotFoundError):
        lp.lpips(np.zeros((3, 32, 32)), np.zeros((3, 32, 32)),
                 weights_path="/nonexistent")


def test_lpips_with_fake_weights(tmp_path):
    path = str(tmp_path / "w.pkl")
    make_fake_weights(path)
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    b = rng.uniform(0, 1, (3, 64, 64)).astype(np.float32)
    same = float(lp.lpips(a, a, weights_path=path))
    diff = float(lp.lpips(a, b, weights_path=path))
    assert abs(same) < 1e-6
    assert diff > same
    assert np.isfinite(diff)


def make_fake_torch_ckpts(tmp_path):
    """Random torch checkpoints in the torchvision / lpips-v0.1 layouts."""
    import torch

    g = torch.Generator().manual_seed(0)
    chans = {0: 64, 2: 64, 5: 128, 7: 128, 10: 256, 12: 256, 14: 256,
             17: 512, 19: 512, 21: 512, 24: 512, 26: 512, 28: 512}
    sd, cin = {}, 3
    for idx, cout in chans.items():
        sd[f"features.{idx}.weight"] = torch.randn(
            (cout, cin, 3, 3), generator=g) * 0.05
        sd[f"features.{idx}.bias"] = torch.randn((cout,), generator=g) * 0.01
        cin = cout
    sd["classifier.0.weight"] = torch.zeros(2, 2)  # extras must be ignored
    lin = {f"lin{i}.model.1.weight":
           torch.rand((1, c, 1, 1), generator=g)
           for i, c in enumerate([64, 128, 256, 512, 512])}
    vgg_path, lin_path = str(tmp_path / "vgg.pth"), str(tmp_path / "lin.pth")
    torch.save(sd, vgg_path)
    torch.save(lin, lin_path)
    return sd, lin, vgg_path, lin_path


def torch_lpips_reference(sd, lin, a, b):
    """The lpipsPyTorch computation (modules/networks.py:1-95 + lpips.py)
    re-implemented directly in torch as an independent oracle."""
    import torch

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    stages = [[0, 2], [5, 7], [10, 12, 14], [17, 19, 21], [24, 26, 28]]

    def features(x):
        x = (x - mean) / std
        feats = []
        for s_i, stage in enumerate(stages):
            for idx in stage:
                x = torch.nn.functional.conv2d(
                    x, sd[f"features.{idx}.weight"],
                    sd[f"features.{idx}.bias"], padding=1).relu()
            feats.append(x)
            if s_i < len(stages) - 1:
                x = torch.nn.functional.max_pool2d(x, 2)
        return feats

    total = 0.0
    for i, (fa, fb) in enumerate(zip(features(a), features(b))):
        fa = fa / (fa.square().sum(1, keepdim=True) + 1e-10).sqrt()
        fb = fb / (fb.square().sum(1, keepdim=True) + 1e-10).sqrt()
        d = (fa - fb).square()
        w = lin[f"lin{i}.model.1.weight"].view(1, -1, 1, 1)
        total = total + (d * w).sum(1, keepdim=True).mean()
    return float(total)


def test_convert_lpips_matches_torch_oracle(tmp_path):
    """convert_lpips.py output drives utils/lpips.py to the SAME value as an
    independent torch re-implementation of lpipsPyTorch on random weights."""
    import sys
    sys.path.insert(0, "/root/repo/scripts")
    import torch

    import convert_lpips

    sd, lin, vgg_path, lin_path = make_fake_torch_ckpts(tmp_path)
    out_path = str(tmp_path / "lpips.npz")
    convert_lpips.convert(vgg_path, lin_path, out_path)

    rng = np.random.default_rng(7)
    a = rng.uniform(0, 1, (1, 3, 48, 64)).astype(np.float32)
    b = rng.uniform(0, 1, (1, 3, 48, 64)).astype(np.float32)
    want = torch_lpips_reference(sd, lin, torch.from_numpy(a),
                                 torch.from_numpy(b))
    got = float(lp.lpips(a, b, weights_path=out_path))
    np.testing.assert_allclose(got, want, rtol=1e-4)
