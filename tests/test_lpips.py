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
