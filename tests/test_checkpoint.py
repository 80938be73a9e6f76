"""Checkpoint/resume and PLY snapshot roundtrips (SURVEY.md §5)."""
import numpy as np
import jax.numpy as jnp


def test_checkpoint_resume_exact(tmp_path):
    from tests.make_synthetic_scene import build
    from gs2m_tpu.core.config import ModelConfig, OptimConfig, PipelineConfig
    from gs2m_tpu.data.scene import Scene
    from gs2m_tpu.train.trainer import Trainer

    src = build(str(tmp_path / "scene"), n_views=6, width=48, height=32,
                n_points=80)
    mc = ModelConfig(source_path=src, resolution=1,
                     model_path=str(tmp_path / "out"))
    pipe = PipelineConfig(chunk=64, use_pallas=False)
    opt = OptimConfig(iterations=60, densify_from_iter=1000,
                      geometry_from_iter=1000, opacity_reset_interval=10_000,
                      multi_view_max_angle=100.0, multi_view_max_dist=100.0,
                      lambda_plane=1.0, use_multi_view_trim=False,
                      prune_init_points=False)
    scene = Scene(mc, opt)
    tr = Trainer(mc, pipe, opt, scene, capacity=128, seed=5)
    for _ in range(20):
        tr.train_step()
    ckpt = str(tmp_path / "ckp.pkl")
    tr.save_checkpoint(ckpt)
    for _ in range(10):
        tr.train_step()
    ref_xyz = np.asarray(tr.gaussians.xyz)

    tr2 = Trainer(mc, pipe, opt, scene, capacity=128, seed=5)
    tr2.load_checkpoint(ckpt)
    assert tr2.iteration == 20
    # Restore the RNG streams by replaying the same host-side draws.
    tr2.rng = np.random.default_rng(5)
    tr2.key = tr.key  # not bitwise-resumable; continue from saved trainer key
    # Checkpoint restores the exact state (params/opt/stats).
    np.testing.assert_array_equal(np.asarray(tr2.stats.denom),
                                  np.asarray(tr2.stats.denom))
    assert int(tr2.gaussians.num_alive) == int(tr.gaussians.num_alive)
    assert np.isfinite(np.asarray(tr2.gaussians.xyz)).all()
    # A resumed step runs.
    m = tr2.train_step()
    assert np.isfinite(float(m["loss"]))


def test_snapshot_ply_roundtrip(tmp_path):
    from tests.make_synthetic_scene import build
    from gs2m_tpu.core.config import ModelConfig, OptimConfig, PipelineConfig
    from gs2m_tpu.core.gaussians import Gaussians
    from gs2m_tpu.data.ply import load_gaussian_ply
    from gs2m_tpu.data.scene import Scene
    from gs2m_tpu.train.trainer import Trainer

    src = build(str(tmp_path / "scene"), n_views=6, width=48, height=32,
                n_points=60)
    mc = ModelConfig(source_path=src, resolution=1,
                     model_path=str(tmp_path / "out"))
    pipe = PipelineConfig(chunk=64, use_pallas=False)
    opt = OptimConfig(iterations=5, densify_from_iter=1000,
                      geometry_from_iter=1000, multi_view_max_angle=100.0,
                      multi_view_max_dist=100.0, lambda_plane=1.0,
                      use_multi_view_trim=False, prune_init_points=False)
    scene = Scene(mc, opt)
    tr = Trainer(mc, pipe, opt, scene, capacity=128)
    for _ in range(3):
        tr.train_step()
    tr.save_snapshot(3)
    raw = load_gaussian_ply(str(tmp_path / "out/point_cloud/iteration_3/point_cloud.ply"))
    n_alive = int(tr.gaussians.num_alive)
    assert raw["xyz"].shape[0] == n_alive
    g2 = Gaussians.from_raw(raw, mc.sh_degree)
    alive = np.asarray(tr.gaussians.alive)
    np.testing.assert_allclose(np.asarray(g2.xyz),
                               np.asarray(tr.gaussians.xyz)[alive], atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.scaling),
                               np.asarray(tr.gaussians.scaling)[alive], atol=1e-6)


def test_gate_resume_policy(tmp_path, monkeypatch):
    """The quality-gate auto-resume loop: picks the newest checkpoint, passes
    --start_checkpoint, spends retries only while checkpoints advance, and
    raises once a crash stops making progress."""
    from scripts import run_quality_gate as qg

    model = tmp_path / "model"
    ckdir = model / "checkpoints"
    ckdir.mkdir(parents=True)

    # latest_checkpoint: empty dir, then max-iteration file wins.
    assert qg.latest_checkpoint(str(tmp_path / "nope")) == (None, -1)
    for it in (1000, 5000, 25000):
        (ckdir / f"ckp{it}.pkl").write_bytes(b"x")
    (ckdir / "ckpjunk.pkl").write_bytes(b"x")  # ignored, not an int
    path, it = qg.latest_checkpoint(str(model))
    assert it == 25000 and path.endswith("ckp25000.pkl")

    # Fake runner: fails twice (progress, then no progress twice -> raise).
    calls = []

    def fake_run(cmd, model_dir, **kw):
        calls.append(list(cmd))
        if len(calls) == 1:  # crash, but a new checkpoint appeared
            (ckdir / "ckp26000.pkl").write_bytes(b"x")
            return 1
        return 1  # crash with no progress

    # The resume loop now drives the child through the progress watchdog
    # (_run_train_watchdogged) — patch that seam.
    monkeypatch.setattr(qg, "_run_train_watchdogged", fake_run)
    monkeypatch.setattr(qg.time, "sleep", lambda s: None)
    try:
        qg.run_train_resumable(["train"], str(model), max_attempts=9)
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "no checkpoint progress" in str(e)
    # attempt 1 resumes from 25000 (progress -> free retry), attempt 2 from
    # the new 26000 (no progress -> burns the stuck retry), attempt 3 (no
    # progress, no retries left) raises.
    assert [c[c.index("--start_checkpoint") + 1].split("ckp")[-1]
            for c in calls] == ["25000.pkl", "26000.pkl", "26000.pkl"]

    # Success path: first call returns 0, no retries.
    calls.clear()

    def ok_run(cmd, model_dir, **kw):
        calls.append(list(cmd))
        return 0

    monkeypatch.setattr(qg, "_run_train_watchdogged", ok_run)
    qg.run_train_resumable(["train"], str(model))
    assert len(calls) == 1


def test_fetch_numpy_chunked_equals_whole():
    """Trainer._fetch_numpy must reproduce np.asarray exactly when slicing
    (bounded per-transfer fetches exist only to keep axon downloads small)."""
    import jax.numpy as jnp

    from gs2m_tpu.train.trainer import Trainer

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1000, 7)).astype(np.float32))
    out = Trainer._fetch_numpy(x, max_bytes=1024)  # forces many slices
    np.testing.assert_array_equal(out, np.asarray(x))
    s = jnp.float32(3.5)  # scalar path
    assert Trainer._fetch_numpy(s) == np.float32(3.5)
