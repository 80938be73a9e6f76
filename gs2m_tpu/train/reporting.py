"""Training observability: TensorBoard scalars/images + periodic evaluation.

Behavioral reference: /root/reference/utils/training_utils.py:30-173 —
per-iteration loss/iter-time/point-count scalars; at test_iterations, PSNR +
L1 on the test split and 5 fixed train views, image grids of every
intermediate map, the environment map, and an opacity histogram.

Uses tensorboardX (pure-python writer); all evaluation renders go through
the same jitted render path as training.
"""
from __future__ import annotations

import numpy as np


class TrainingReporter:
    def __init__(self, model_path: str, enable: bool = True):
        self.writer = None
        if enable:
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(model_path)
            except Exception as e:  # pragma: no cover
                print(f"[!] TensorBoard unavailable: {e}")

    def scalars(self, iteration: int, metrics: dict, points: int,
                iter_time_ms: float | None = None):
        if self.writer is None:
            return
        for k, v in metrics.items():
            self.writer.add_scalar(f"train_loss_patches/{k}", float(v), iteration)
        self.writer.add_scalar("total_points", points, iteration)
        if iter_time_ms is not None:
            self.writer.add_scalar("iter_time", iter_time_ms, iteration)

    def histogram(self, iteration: int, name: str, values: np.ndarray):
        if self.writer is None:
            return
        v = np.asarray(values)
        v = v[np.isfinite(v)]
        if v.size:
            self.writer.add_histogram(name, v, iteration)

    def image(self, iteration: int, name: str, img_chw: np.ndarray):
        if self.writer is None:
            return
        self.writer.add_image(name, np.clip(np.asarray(img_chw), 0, 1),
                              iteration)

    def close(self):
        if self.writer is not None:
            self.writer.close()


def evaluate_views(trainer, cameras, gt_images, n_views: int | None = None,
                   log_images_to: TrainingReporter | None = None,
                   iteration: int = 0, tag: str = "test"):
    """PSNR/L1 over a view list (training_utils.py:59-168). Renders with the
    trainer's production backend."""
    import jax.numpy as jnp

    from gs2m_tpu.models.render import render_jit

    n = len(cameras) if n_views is None else min(n_views, len(cameras))
    psnrs, l1s = [], []
    for i in range(n):
        pkg = render_jit(trainer.gaussians, cameras[i], jnp.zeros(3),
                         trainer.active_sh_degree, geometry_stage=True,
                         backend=trainer.backend, tile=trainer.pipe.tile,
                         chunk=trainer.pipe.chunk,
                         instance_cap=trainer.instance_cap)
        img = np.clip(np.asarray(pkg["render"]), 0, 1)
        gt = np.clip(np.asarray(gt_images[i]), 0, 1)
        mse = float(np.mean((img - gt) ** 2))
        psnrs.append(20 * np.log10(1.0 / np.sqrt(max(mse, 1e-12))))
        l1s.append(float(np.mean(np.abs(img - gt))))
        if log_images_to is not None and i < 5:
            log_images_to.image(iteration, f"{tag}_view_{i}/render", img)
            log_images_to.image(iteration, f"{tag}_view_{i}/gt", gt)
            d = np.asarray(pkg["depth_map"][0])
            lo, hi = np.percentile(d, 1), np.percentile(d, 99)
            log_images_to.image(iteration, f"{tag}_view_{i}/depth",
                                ((d - lo) / (hi - lo + 1e-8))[None])
            log_images_to.image(iteration, f"{tag}_view_{i}/normal",
                                np.asarray(pkg["normal_map"]) * 0.5 + 0.5)
    return {"psnr": float(np.mean(psnrs)), "l1": float(np.mean(l1s))}
