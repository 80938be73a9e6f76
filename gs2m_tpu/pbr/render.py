"""Deferred PBR pass + the material-stage loss bundle for the trainer.

Behavioral reference: /root/reference/pbr/__init__.py:9-55 (pbr_render:
mips rebuilt per step, normals detached + normalized, metallic estimated as
alpha * (1 - roughness) when not trained, roughness remapped to [0.04, 1]
and detached) and /root/reference/train.py:134-189 (material losses: PBR
photometric, roughness/metallic + albedo smoothness, roughness-weighted
normal TV, roughness-from-reflection supervision against a nearby view).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gs2m_tpu.data.scene import index_camera
from gs2m_tpu.models import losses as L
from gs2m_tpu.pbr import cubemap as cm
from gs2m_tpu.pbr import shade as sh
from gs2m_tpu.train.optim import adam_init, adam_update


def view_dirs_world(camera) -> jnp.ndarray:
    """(H, W, 3) unit directions surface->camera (pbr/__init__.py:14-18)."""
    rays = camera.get_canonical_rays()
    rays = rays / (jnp.linalg.norm(rays, axis=-1, keepdims=True) + 1e-12)
    vd = -(rays @ camera.world_view[:3, :3].T)
    vd = vd / (jnp.linalg.norm(vd, axis=-1, keepdims=True) + 1e-12)
    return vd.reshape(camera.height, camera.width, 3)


def pbr_render(light_base: jnp.ndarray, camera, render_pkg: dict,
               brdf_lut: jnp.ndarray, metallic_trained: bool,
               gamma: bool = False, mips=None) -> dict:
    """The deferred shading pass. Differentiable in light_base AND in the
    blended albedo/metallic maps (normals + roughness detached, matching
    pbr/__init__.py:24-40). `mips` lets a caller shading MANY views from one
    unchanged light pass the prefiltered (diffuse, specular) stack once
    (build_mips is a dense weight-matrix matmul chain — rebuilding it per
    view multiplies eval wall-clock for nothing)."""
    sg = jax.lax.stop_gradient
    diffuse, specular = cm.build_mips(light_base) if mips is None else mips

    normal_map = sg(render_pkg["normal_map"])               # (3, H, W)
    nrm = jnp.linalg.norm(normal_map, axis=0, keepdims=True)
    normal_map = jnp.where(nrm > 0, normal_map / (nrm + 1e-12), normal_map)

    albedo = jnp.clip(render_pkg["albedo_map"], 0.0, 1.0)
    roughness = render_pkg["roughness_map"]
    if metallic_trained:
        metallic = render_pkg["metallic_map"]
    else:
        alpha = sg(render_pkg["alpha_map"])
        metallic = sg(alpha * jnp.clip(1.0 - roughness, 0.0, 1.0))
    roughness = sg(roughness * (1.0 - 0.04) + 0.04)

    hwc = lambda x: x.transpose(1, 2, 0)
    pkg = sh.pbr_shading(
        diffuse, specular,
        normals=hwc(normal_map), view_dirs=view_dirs_world(camera),
        albedo=hwc(albedo), roughness=hwc(roughness), brdf_lut=brdf_lut,
        metallic=hwc(metallic), gamma=gamma,
        occlusion=jnp.ones((camera.height, camera.width, 1)),
        irradiance=jnp.zeros((camera.height, camera.width, 1)))
    pkg["roughness_map"] = roughness
    pkg["metallic_map"] = metallic
    return pkg


def make_pbr_fns(base_res: int = 512, seed: int = 0) -> dict:
    """The trainer's material-stage plug (Trainer(pbr_fns=...))."""
    brdf_lut = sh.get_brdf_lut()

    def init_light():
        return cm.init_cubemap(jax.random.PRNGKey(seed), base_res)

    def light_update(light, grad, opt_state, lr):
        new_light, opt_state = adam_update(light, grad, opt_state, lr)
        # train.py:263 clamps the cubemap base to >= 0 after each step.
        return jnp.maximum(new_light, 0.0), opt_state

    def material_losses(g, cam, pkg, gt, light_base, opt, model_cfg,
                        nearby_row, nearby_mask_row, gray_ref, gray_images,
                        camera_stack, key, ncc_scale, active_sh_degree,
                        render_kw):
        from gs2m_tpu.models.render import render as render_fn
        from gs2m_tpu.train.trainer import _choose_neighbor

        pbr_pkg = pbr_render(light_base, cam, pkg, brdf_lut,
                             metallic_trained=model_cfg.metallic,
                             gamma=model_cfg.gamma)

        normal_mask = pkg["normal_mask"]
        render_pbr = jnp.clip(pbr_pkg["render_rgb"].transpose(2, 0, 1), 0, 1)
        render_pbr = jnp.where(normal_mask, render_pbr, 0.0)

        Lpbr = L.rgb_loss(render_pbr, gt, opt.lambda_ssim)

        arm = (jnp.concatenate([pkg["roughness_map"], pkg["metallic_map"]], 0)
               if model_cfg.metallic else pkg["roughness_map"])
        Lsm = (opt.lambda_smooth * L.tv_loss(gt, arm, norm1=False)
               + 0.01 * L.tv_loss(gt, pkg["albedo_map"]))

        weight_normal = jax.lax.stop_gradient(1.0 - pkg["roughness_map"])
        weight_normal = jnp.clip(0.5 * jnp.tanh(8.0 * (weight_normal - 0.5))
                                 + 0.5, 0.0, 1.0)
        Ltv = opt.lambda_normal * L.tv_loss(gt, pkg["normal_map"],
                                            weight_map=weight_normal)

        # Roughness-from-reflection: nearby view rendered WITHOUT gradients
        # (train.py:186, loss_utils.py:147). The whole neighbor render +
        # NCC machinery sits under a lax.cond on has_nearby: views with an
        # empty nearby set skip the render at RUNTIME instead of rendering
        # camera 0 and masking the result away (both branches compile once,
        # only the taken one runs; lax.cond differentiates the taken branch,
        # so the roughness-map gradient path through `pkg` is preserved).
        k_nb, k_r = jax.random.split(key)
        view_idx = 0  # unused fallback handled by the cond below
        nearby_idx, has_nearby = _choose_neighbor(k_nb, nearby_row,
                                                  nearby_mask_row, view_idx)
        nearby_cam = index_camera(camera_stack, nearby_idx)
        gray_nea = gray_images[nearby_idx]

        def roughness_branch(_):
            npkg = render_fn(jax.lax.stop_gradient(g), nearby_cam,
                             jnp.zeros(3), active_sh_degree,
                             geometry_stage=True, **render_kw)
            npkg = jax.tree.map(jax.lax.stop_gradient, npkg)
            return L.roughness_loss(opt, cam, nearby_cam, pkg, npkg,
                                    gray_ref, gray_nea, k_r, ncc_scale)

        Lr = jax.lax.cond(has_nearby, roughness_branch,
                          lambda _: jnp.float32(0.0), None)

        Lmat = Lpbr + Lsm + Ltv + opt.lambda_rough * Lr
        return Lmat, {"rough_active": has_nearby}

    return {"init_light": init_light, "light_update": light_update,
            "material_losses": material_losses, "brdf_lut": brdf_lut}
