"""Render + mesh-extraction CLI.

Behavioral reference: /root/reference/render.py:35-288 — per-view map export
(gt/render/normal/depth, + albedo/roughness/metallic/diffuse/specular when
material), grazing-angle depth filtering, TSDF fusion + cluster cleanup,
--dtu/--tnt/--blender dataset presets, points.json bookkeeping, saved-config
merge with CLI override.

Usage: python -m gs2m_tpu.apps.render -m <model_dir> [--dtu|--tnt|--blender]
"""
from __future__ import annotations

import json
import os
import sys
from argparse import ArgumentParser
from pathlib import Path

import numpy as np


def render_views(model_cfg, pipe, args, scene, gaussians, light_state, split,
                 cameras, camera_infos, gt_images, alpha_masks, iteration,
                 bounds=None):
    import jax
    import jax.numpy as jnp

    from gs2m_tpu.mesh import (fuse_depths, keep_largest_clusters,
                               marching_tetrahedra_blocks)
    from gs2m_tpu.data.ply import store_mesh
    from gs2m_tpu.models.render import render_jit
    from gs2m_tpu.utils.images import (convert_normal_for_save, save_depth_colormap,
                                       save_image, save_rgba)

    if not cameras:
        print(f"[!] No views to render in {split} set")
        return

    base = Path(model_cfg.model_path) / split / f"{args.label}_{iteration}"
    dirs = {k: base / k for k in ["render", "gt", "normal", "depth"]}
    if model_cfg.material:
        dirs.update({k: base / k for k in
                     ["albedo", "roughness", "metallic", "diffuse", "specular"]})
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)

    brdf_lut = None
    if model_cfg.material:
        from gs2m_tpu.pbr import cubemap as cmod
        from gs2m_tpu.pbr import shade as smod
        brdf_lut = smod.get_brdf_lut()
        envmap = cmod.cubemap_to_latlong(jnp.asarray(light_state), (256, 512))
        save_image(base / "envmap.png",
                   np.clip(np.asarray(envmap), 0, 1).transpose(2, 0, 1))

    # points.json bookkeeping (render.py:60-67).
    point_file = Path(model_cfg.model_path) / "points.json"
    points = json.loads(point_file.read_text()) if point_file.exists() else {}
    points[f"{args.label}_{iteration}"] = int(gaussians.num_alive)
    point_file.write_text(json.dumps(points, indent=4))

    bg = jnp.ones(3) if model_cfg.white_background else jnp.zeros(3)
    fusion_depths = []
    backend = "pallas" if pipe.use_pallas else "xla"
    instance_cap = max(int(8 * gaussians.capacity) // pipe.chunk * pipe.chunk,
                       4 * pipe.chunk)
    need_sobel = args.filter_depth or args.normal_sobel

    # --spatial N: tile-sharded rendering over an N-device "sp" mesh
    # (parallel/sp.py) — each device rasterizes a horizontal band, the
    # derived maps come from the identical shared post-pass. The natural
    # axis for eval sweeps / mesh-extraction renders at full resolution
    # (training parallelism stays on the DP axis — see README).
    spatial = max(int(getattr(args, "spatial", 0) or 0), 0)
    cap_band = instance_cap

    def make_sp(cap):
        import jax
        from jax.sharding import Mesh

        from gs2m_tpu.models.render import feature_count_for
        from gs2m_tpu.parallel.sp import make_sp_render
        devs = np.array(jax.devices()[:spatial])
        assert devs.size == spatial, \
            f"--spatial {spatial} needs {spatial} devices, have {devs.size}"
        mesh = Mesh(devs, ("sp",))
        return make_sp_render(
            mesh, cameras[0].height, cameras[0].width,
            feature_count=feature_count_for(True, True, model_cfg.metallic),
            active_sh_degree=gaussians.max_sh_degree, tile=pipe.tile,
            chunk=pipe.chunk, instance_cap_per_band=cap, backend=backend)

    sp_render = None
    if spatial > 1:
        cap_band = max(instance_cap // spatial // pipe.chunk * pipe.chunk,
                       4 * pipe.chunk)
        sp_render = make_sp(cap_band)

    def render_one(cam):
        from gs2m_tpu.models.render import derive_render_pkg
        from gs2m_tpu.ops.rasterize import RasterOut
        nonlocal sp_render, cap_band, instance_cap
        if sp_render is not None:
            d = sp_render(gaussians, cam, bg)
            while int(d["dropped"]) > 0 and cap_band < 2 ** 26:
                cap_band *= 2
                sp_render = make_sp(cap_band)
                d = sp_render(gaussians, cam, bg)
            out = RasterOut(color=d["color"], buffer=d["buffer"],
                            final_T=d["final_T"], radii=d["radii"],
                            observe=d["observe"], dropped=d["dropped"])
            return derive_render_pkg(out, cam, bg, sobel_normal=need_sobel)
        pkg = render_jit(gaussians, cam, bg, gaussians.max_sh_degree,
                         geometry_stage=True, material_stage=True,
                         sobel_normal=need_sobel,
                         blend_metallic=model_cfg.metallic,
                         backend=backend, tile=pipe.tile, chunk=pipe.chunk,
                         instance_cap=instance_cap)
        while int(pkg["dropped"]) > 0 and instance_cap < 2 ** 26:
            instance_cap *= 2
            pkg = render_jit(gaussians, cam, bg, gaussians.max_sh_degree,
                             geometry_stage=True, material_stage=True,
                             sobel_normal=need_sobel,
                             blend_metallic=model_cfg.metallic,
                             backend=backend, tile=pipe.tile, chunk=pipe.chunk,
                             instance_cap=instance_cap)
        return pkg

    for i, (cam, info) in enumerate(zip(cameras, camera_infos)):
        pkg = render_one(cam)
        stem = info.image_name.rsplit(".", 1)[0]

        if gt_images is not None:
            gt = np.clip(np.asarray(gt_images[i]), 0, 1)
            if model_cfg.white_background and alpha_masks is not None:
                gt = np.where(np.asarray(alpha_masks[i]) > 0.5, gt,
                              np.asarray(bg)[:, None, None])
            save_image(dirs["gt"] / f"{stem}.png", gt)

        nmap = pkg["sobel_map"] if args.normal_sobel else pkg["normal_map"]
        normal_img = convert_normal_for_save(np.asarray(nmap), cam,
                                             args.normal_world)
        if model_cfg.white_background and alpha_masks is not None:
            save_rgba(dirs["normal"] / f"{stem}.png", normal_img,
                      np.asarray(alpha_masks[i]))
        else:
            save_image(dirs["normal"] / f"{stem}.png", normal_img)

        depth = np.asarray(pkg["depth_map"][0])
        save_depth_colormap(dirs["depth"] / f"{stem}.png", depth)

        tsdf_depth = depth.copy()
        if args.filter_depth:
            rays = np.asarray(cam.get_rays())
            rays = rays / np.linalg.norm(rays, axis=-1, keepdims=True)
            sm = np.asarray(pkg["sobel_map"]).transpose(1, 2, 0)
            sm = sm / (np.linalg.norm(sm, axis=-1, keepdims=True) + 1e-12)
            ang = np.arccos(np.abs(np.sum(rays * sm, -1)))
            tsdf_depth[ang > (100.0 / 180.0 * np.pi)] = 0.0
        fusion_depths.append(tsdf_depth)

        if not model_cfg.material:
            render_img = np.clip(np.asarray(pkg["render"]), 0, 1)
            save_image(dirs["render"] / f"{stem}.png", render_img)
        else:
            from gs2m_tpu.pbr import linear_to_srgb, pbr_render
            ppkg = pbr_render(jnp.asarray(light_state), cam, pkg, brdf_lut,
                              metallic_trained=model_cfg.metallic,
                              gamma=model_cfg.gamma)
            pbr_img = np.clip(np.asarray(ppkg["render_rgb"]), 0, 1
                              ).transpose(2, 0, 1)
            if model_cfg.mask_gt or model_cfg.white_background:
                mask = np.asarray(alpha_masks[i]) > 0.5 if alpha_masks is not None \
                    else np.asarray(pkg["normal_mask"])
                fill = 0.0 if model_cfg.mask_gt else np.asarray(bg)[:, None, None]
            else:
                mask = np.asarray(pkg["normal_mask"])
                fill = np.asarray(bg)[:, None, None]
            pbr_img = np.where(mask, pbr_img, fill)
            save_image(dirs["render"] / f"{stem}.png", pbr_img)

            def comp(x):
                x = np.asarray(x)
                if model_cfg.gamma:
                    x = np.asarray(linear_to_srgb(jnp.asarray(x)))
                return np.clip(x, 0, 1).transpose(2, 0, 1)

            save_image(dirs["albedo"] / f"{stem}.png",
                       np.clip(np.asarray(pkg["albedo_map"]), 0, 1))
            save_image(dirs["roughness"] / f"{stem}.png",
                       np.asarray(ppkg["roughness_map"]))
            save_image(dirs["metallic"] / f"{stem}.png",
                       np.asarray(ppkg["metallic_map"]))
            save_image(dirs["diffuse"] / f"{stem}.png", comp(ppkg["diffuse_rgb"]))
            save_image(dirs["specular"] / f"{stem}.png", comp(ppkg["specular_rgb"]))

    if args.extract_mesh:
        mesh_dir = base / "mesh"
        os.makedirs(mesh_dir, exist_ok=True)
        max_depth = args.max_depth if args.max_depth > 0 else 2.0 * scene.cameras_extent
        voxel_size = args.voxel_size if args.voxel_size > 0 else max_depth / 1024.0
        sdf_trunc = args.sdf_trunc if args.sdf_trunc > 0 else 4.0 * voxel_size
        (mesh_dir / "config.json").write_text(json.dumps(
            {"max_depth": max_depth, "voxel_size": voxel_size,
             "sdf_trunc": sdf_trunc}, indent=4))

        colors = np.zeros((len(cameras), 3, cameras[0].height, cameras[0].width),
                          np.float32)
        for i, (cam, info) in enumerate(zip(cameras, camera_infos)):
            from PIL import Image
            p = dirs["render"] / (info.image_name.rsplit(".", 1)[0] + ".png")
            img = np.asarray(Image.open(p), np.float32)[..., :3] / 255.0
            colors[i] = img.transpose(2, 0, 1)

        print("[>] TSDF fusion...")
        vol = fuse_depths(np.stack(fusion_depths), colors, cameras,
                          voxel_size, sdf_trunc, max_depth,
                          alpha_masks=alpha_masks if bounds is None else None,
                          bounds=bounds)
        print(f"[>] Extracting mesh from {vol.block_coords.shape[0]} blocks...")
        v, f, c = marching_tetrahedra_blocks(vol)
        store_mesh(str(mesh_dir / "tsdf_mesh.ply"), v, f, c)
        print(f"[>] Raw mesh: {len(v)} vertices, {len(f)} faces")
        v2, f2, c2 = keep_largest_clusters(v, f, c, args.num_clusters)
        store_mesh(str(mesh_dir / "tsdf_post.ply"), v2, f2, c2)
        print(f"[>] Post-processed mesh: {len(v2)} vertices -> "
              f"{mesh_dir / 'tsdf_post.ply'}")


def main(argv=None):
    parser = ArgumentParser(description="gs2m_tpu rendering + mesh extraction")
    from gs2m_tpu.core.config import (ModelConfig, PipelineConfig, OptimConfig,
                                      add_group_args, combine_args)
    add_group_args(parser, ModelConfig, fill_none=True)
    add_group_args(parser, PipelineConfig, fill_none=True)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--label", default="ours", type=str)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--extract_mesh", action="store_true")
    parser.add_argument("--max_depth", default=-1.0, type=float)
    parser.add_argument("--voxel_size", default=-1.0, type=float)
    parser.add_argument("--sdf_trunc", default=-1.0, type=float)
    parser.add_argument("--num_clusters", default=1, type=int)
    parser.add_argument("--filter_depth", action="store_true")
    parser.add_argument("--dtu", action="store_true")
    parser.add_argument("--tnt", action="store_true")
    parser.add_argument("--blender", action="store_true")
    parser.add_argument("--normal_world", action="store_true")
    parser.add_argument("--normal_sobel", action="store_true")
    parser.add_argument("--spatial", type=int, default=0,
                        help="tile-shard each render over N devices "
                             "(parallel/sp.py band mesh); 0/1 = single chip")
    parser.add_argument("--device", type=str, default="")
    args, model_cfg, pipe, _ = combine_args(parser, argv)

    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)

    bounds = None
    if args.dtu:
        args.max_depth, args.voxel_size = 5.0, 0.002
        args.sdf_trunc = 4.0 * args.voxel_size
        args.num_clusters, args.filter_depth = 1, False
        args.extract_mesh, args.skip_test = True, True
        args.normal_world = False
    if args.tnt:
        tnt_360 = ["barn", "caterpillar", "ignatius", "truck"]
        scene_name = Path(model_cfg.model_path).name.lower()
        args.max_depth = 3.0 if scene_name in tnt_360 else 4.5
        args.num_clusters, args.filter_depth = 1, True
        args.extract_mesh, args.skip_test = True, True
        args.normal_world = False
        voxel_size = 0.002
        tf = Path(model_cfg.source_path) / "transforms.json"
        if tf.exists():
            transforms = json.loads(tf.read_text())
            if "aabb_range" in transforms:
                bounds = np.array(transforms["aabb_range"])
                voxel_size = float(np.max(bounds[:, 1] - bounds[:, 0]) / 2048)
        args.voxel_size = voxel_size
        args.sdf_trunc = 4.0 * voxel_size
    if args.blender:
        args.skip_train, args.skip_test = True, False
        args.normal_world, args.extract_mesh = True, True
        args.max_depth, args.voxel_size = 8.0, 0.004
        args.sdf_trunc = 4.0 * args.voxel_size
        args.num_clusters = 1

    import jax.numpy as jnp

    from gs2m_tpu.core.gaussians import Gaussians
    from gs2m_tpu.data.ply import load_gaussian_ply
    from gs2m_tpu.data.readers import load_view_arrays
    from gs2m_tpu.data.scene import Scene, search_max_iteration

    iteration = args.iteration
    if iteration == -1:
        iteration = search_max_iteration(
            os.path.join(model_cfg.model_path, "point_cloud"))
    load_dir = Path(model_cfg.model_path) / "point_cloud" / f"iteration_{iteration}"
    print(f"[>] Loading snapshot at iteration {iteration}")
    raw = load_gaussian_ply(str(load_dir / "point_cloud.ply"))
    gaussians = Gaussians.from_raw(raw, model_cfg.sh_degree)

    light_state = None
    if model_cfg.material:
        import pickle
        with open(load_dir / "lighting.pkl", "rb") as f:
            light_state = pickle.load(f)

    scene = Scene(model_cfg, shuffle=False, load_images=False)

    def view_arrays(infos, cams):
        rgbs, alphas = [], []
        for ci, cam in zip(infos, cams):
            rgb, alpha = load_view_arrays(ci, (cam.width, cam.height),
                                          model_cfg.mask_gt)
            rgbs.append(rgb)
            alphas.append(alpha if alpha is not None else np.ones_like(rgb[:1]))
        return np.stack(rgbs), np.stack(alphas)

    if not args.skip_train:
        gt, am = view_arrays(scene.train_camera_infos, scene.train_cameras)
        render_views(model_cfg, pipe, args, scene, gaussians, light_state,
                     "train", scene.train_cameras, scene.train_camera_infos,
                     gt, am, iteration, bounds)
    if not args.skip_test and scene.test_cameras:
        gt, am = view_arrays(scene.test_camera_infos, scene.test_cameras)
        render_views(model_cfg, pipe, args, scene, gaussians, light_state,
                     "test", scene.test_cameras, scene.test_camera_infos,
                     gt, am, iteration, None)


if __name__ == "__main__":
    main(sys.argv[1:])
