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


def _render_guarded(trainer, camera, material_stage: bool):
    """One eval render that refuses to report on a silently-truncated frame:
    if the binning buffer overflowed (pkg['dropped'] > 0) the PSNR would be
    deflated by missing splats, so grow the instance cap (same demand-sized
    policy as the training path, trainer._grow_instance_cap) and re-render.
    Bounded retries; at the hard cap the last (dropped) frame is returned and
    the drop is reported loudly."""
    import jax.numpy as jnp

    from gs2m_tpu.models.render import render_jit

    # Same render options as the training step's render_kw (trainer.py:52-54)
    # — blend_metallic selects feature_count 10 and z_depth the depth kind;
    # dropping either changes eval semantics vs training (metallic=True
    # would read an EMPTY metallic_map slice and crash the PBR pass).
    model_cfg = getattr(trainer, "model_cfg", None)
    kw = dict(backend=trainer.backend, tile=trainer.pipe.tile,
              chunk=trainer.pipe.chunk,
              z_depth=getattr(trainer.pipe, "z_depth", False),
              blend_metallic=bool(model_cfg and model_cfg.metallic))
    for _ in range(4):
        pkg = render_jit(trainer.gaussians, camera, jnp.zeros(3),
                         trainer.active_sh_degree, geometry_stage=True,
                         material_stage=material_stage,
                         instance_cap=trainer.instance_cap, **kw)
        dropped = int(pkg["dropped"])
        if dropped == 0:
            return pkg
        before = trainer.instance_cap
        trainer._grow_instance_cap(dropped=dropped)
        if trainer.instance_cap == before:  # at MAX_INSTANCE_CAP
            print(f"[!] eval render dropped {dropped} instances at the "
                  f"maximum instance cap — PSNR is a lower bound", flush=True)
            return pkg
    print(f"[!] eval render still dropping {dropped} instances after "
          f"repeated cap growth (cap now {trainer.instance_cap}) — PSNR is "
          f"a lower bound", flush=True)
    return pkg


def evaluate_views(trainer, cameras, gt_images, n_views: int | None = None,
                   log_images_to: TrainingReporter | None = None,
                   iteration: int = 0, tag: str = "test"):
    """PSNR/L1 over a view list (training_utils.py:59-168). Renders with the
    trainer's production backend. In the material stage this also runs the
    deferred PBR pass per view — psnr_pbr/l1_pbr scalars, albedo/roughness/
    metallic/diffuse/specular image grids, and the environment map, matching
    training_utils.py:69-71,95-173."""
    material_stage = (trainer.pbr_fns is not None
                      and trainer._stage_flags(trainer.iteration)[1])
    brdf_lut = trainer.pbr_fns["brdf_lut"] if material_stage else None
    mips = None
    if material_stage:
        from gs2m_tpu.pbr import cubemap as cmod
        # One prefilter pass for the whole eval: the light doesn't change
        # between views and build_mips is a dense matmul chain.
        mips = cmod.build_mips(trainer.light_state)
        if log_images_to is not None:
            env = np.asarray(cmod.cubemap_to_latlong(trainer.light_state,
                                                     (256, 512)))
            log_images_to.image(iteration, "scene/envmap",
                                np.clip(env, 0, 1).transpose(2, 0, 1))

    n = len(cameras) if n_views is None else min(n_views, len(cameras))
    psnrs, l1s, psnrs_pbr, l1s_pbr = [], [], [], []
    for i in range(n):
        pkg = _render_guarded(trainer, cameras[i], material_stage)
        img = np.clip(np.asarray(pkg["render"]), 0, 1)
        gt = np.clip(np.asarray(gt_images[i]), 0, 1)
        mse = float(np.mean((img - gt) ** 2))
        psnrs.append(20 * np.log10(1.0 / np.sqrt(max(mse, 1e-12))))
        l1s.append(float(np.mean(np.abs(img - gt))))

        ppkg = None
        if material_stage:
            from gs2m_tpu.pbr.render import pbr_render
            ppkg = pbr_render(trainer.light_state, cameras[i], pkg, brdf_lut,
                              metallic_trained=trainer.model_cfg.metallic,
                              gamma=trainer.model_cfg.gamma, mips=mips)
            nm = np.asarray(pkg["normal_mask"])
            # PBR image over the (zero) background outside the surface mask
            # (training_utils.py:124-127).
            pbr_img = np.where(nm, np.clip(
                np.asarray(ppkg["render_rgb"]).transpose(2, 0, 1), 0, 1), 0.0)
            mse_p = float(np.mean((pbr_img - gt) ** 2))
            psnrs_pbr.append(20 * np.log10(1.0 / np.sqrt(max(mse_p, 1e-12))))
            l1s_pbr.append(float(np.mean(np.abs(pbr_img - gt))))

        if log_images_to is not None and i < 5:
            log_images_to.image(iteration, f"{tag}_view_{i}/render", img)
            log_images_to.image(iteration, f"{tag}_view_{i}/gt", gt)
            d = np.asarray(pkg["depth_map"][0])
            lo, hi = np.percentile(d, 1), np.percentile(d, 99)
            log_images_to.image(iteration, f"{tag}_view_{i}/depth",
                                ((d - lo) / (hi - lo + 1e-8))[None])
            log_images_to.image(iteration, f"{tag}_view_{i}/normal",
                                np.asarray(pkg["normal_map"]) * 0.5 + 0.5)
            if ppkg is not None:
                hwc = lambda k: np.asarray(ppkg[k]).transpose(2, 0, 1)
                log_images_to.image(iteration, f"{tag}_view_{i}/albedo",
                                    np.asarray(pkg["albedo_map"]))
                log_images_to.image(iteration, f"{tag}_view_{i}/roughness",
                                    np.asarray(ppkg["roughness_map"]))
                log_images_to.image(iteration, f"{tag}_view_{i}/metallic",
                                    np.asarray(ppkg["metallic_map"]))
                log_images_to.image(iteration, f"{tag}_view_{i}/z_pbr_render",
                                    pbr_img)
                log_images_to.image(iteration,
                                    f"{tag}_view_{i}/z_shade_diffuse",
                                    hwc("diffuse_rgb"))
                log_images_to.image(iteration,
                                    f"{tag}_view_{i}/z_shade_specular",
                                    hwc("specular_rgb"))
    res = {"psnr": float(np.mean(psnrs)), "l1": float(np.mean(l1s))}
    if material_stage:
        res["psnr_pbr"] = float(np.mean(psnrs_pbr))
        res["l1_pbr"] = float(np.mean(l1s_pbr))
    return res
