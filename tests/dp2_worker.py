"""One process of the REAL multi-host DP path (VERDICT r3 next #4).

Run as: python tests/dp2_worker.py <process_id> <port> <outdir> [steps]

Each of the 2 processes exposes 4 virtual CPU devices (8 global), calls
jax.distributed.initialize with gloo CPU collectives, partitions the views
(parallel/dp.py partition_views), zeroes every GT/alpha/gray row OUTSIDE its
host_view_closure (exactly what Scene.load_train_image_subset produces from
disk), and drives Trainer.train_step on the global 8-device mesh — the code
path apps/train.py takes on a real pod. Process 0 writes the final params +
the global per-step view batches to <outdir> for the pytest to compare
against a single-process 8-device run.
"""
import os
import sys


def build_scene(n_views=8, width=48, height=32, n_points=96, capacity=128):
    """Deterministic tiny scene with a SPARSE neighbor graph (tight angle
    windows) so host view closures are strict subsets — otherwise zeroing
    non-closure rows tests nothing."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from gs2m_tpu.core.config import ModelConfig, OptimConfig, PipelineConfig
    from gs2m_tpu.core.gaussians import Gaussians
    from gs2m_tpu.data.readers import CameraInfo, SceneInfo
    from gs2m_tpu.data.scene import Scene
    from tests.make_synthetic_scene import ring_camera

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(n_points, 3)).astype(np.float32) * 0.6
    cols = ((pts - pts.min(0)) / (pts.max(0) - pts.min(0))).astype(np.float32)

    infos = []
    fx = 0.9 * width
    for i in range(n_views):
        R, T = ring_camera(2 * np.pi * i / n_views)
        infos.append(CameraInfo(
            uid=i, R=R, T=T, fx=fx, fy=fx, width=width, height=height,
            image_name=f"v{i}", image_path=""))
    info = SceneInfo(points=pts, colors=cols, normals=np.zeros_like(pts),
                     train_cameras=infos, test_cameras=[],
                     translate=np.zeros(3), radius=5.0)

    mc = ModelConfig(resolution=1, sh_degree=2)
    # 20 degrees on an 8-camera ring (45-degree separation): the neighbor
    # graph is EMPTY, so each host's closure is exactly its own partition —
    # a strict subset. (With any stride-2 partition on a ring, adjacent
    # neighbors always belong to the other host, so a non-empty graph makes
    # the closure cover everything; an empty graph is the only way to get
    # genuinely divergent per-host stacks, which is the path under test.)
    opt = OptimConfig(multi_view_max_angle=20.0, multi_view_max_dist=100.0,
                      nearby_cam_max_angle=20.0, nearby_cam_max_dist=100.0,
                      multi_view_sample_num=128, geometry_from_iter=0,
                      iterations=30)
    pipe = PipelineConfig(chunk=64, use_pallas=False)
    scene = Scene(mc, resolution_scale=1.0, shuffle=False, load_images=False,
                  scene_info=info)
    scene.gt_images = jnp.asarray(
        rng.uniform(0, 1, (n_views, 3, height, width)).astype(np.float32))
    scene.alpha_masks = jnp.ones((n_views, 1, height, width), jnp.float32)
    scene.training_setup(opt)

    g = Gaussians.create(pts, cols, max_sh_degree=2, capacity=capacity)
    q = rng.normal(size=(capacity, 4)).astype(np.float32)
    g = dataclasses.replace(g, rotation=jnp.asarray(q))
    return mc, pipe, opt, scene, g


def view_schedule(partition, n_local, steps):
    """Deterministic per-host view picks: step t, local device d ->
    partition[(t * n_local + d) % len(partition)]."""
    return [[int(partition[(t * n_local + d) % len(partition)])
             for d in range(n_local)] for t in range(steps)]


def main():
    pid, port, outdir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from gs2m_tpu.parallel.dp import host_view_closure, partition_views
    from gs2m_tpu.train.trainer import Trainer

    assert jax.process_count() == 2 and len(jax.devices()) == 8

    mc, pipe, opt, scene, g = build_scene()
    n_views = len(scene.train_cameras)
    local = partition_views(n_views, pid, 2)
    closure = host_view_closure(local, scene.nearest_table,
                                scene.nearest_mask, scene.nearby_table,
                                scene.nearby_mask)
    # The divergence under test: rows outside this host's closure are
    # all-zero, exactly like Scene.load_train_image_subset off disk.
    assert len(closure) < n_views, "closure covers everything — no teeth"
    keep = np.zeros(n_views, bool)
    keep[np.asarray(closure)] = True
    mask = jnp.asarray(keep.astype(np.float32))[:, None, None, None]
    scene.gt_images = scene.gt_images * mask
    scene.alpha_masks = scene.alpha_masks * mask
    scene.gray_images = scene.gray_images * mask

    mesh = Mesh(np.array(jax.devices()), ("data",))
    tr = Trainer(mc, pipe, opt, scene, mesh=mesh)
    assert tr.process_count == 2 and tr.n_local_devices == 4

    sched = view_schedule(local, 4, steps)
    flat = [v for step in sched for v in step]
    it = iter(flat)
    tr._next_view = lambda: next(it)

    losses = []
    for _ in range(steps):
        m = tr.train_step()
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses)), losses

    if pid == 0:
        params = {k: np.asarray(v)
                  for k, v in tr.gaussians.params_dict().items()}
        np.savez(os.path.join(outdir, "mp_params.npz"),
                 losses=np.array(losses), **params)
    print(f"WORKER{pid} OK losses={losses}", flush=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
