"""Data layer: PLY roundtrip, COLMAP parse, scene assembly, neighbor tables."""
import os

import numpy as np
import pytest

from gs2m_tpu.core.config import ModelConfig, OptimConfig
from gs2m_tpu.data import colmap as cm
from gs2m_tpu.data import ply
from gs2m_tpu.data.readers import pick_resolution, read_colmap_scene
from gs2m_tpu.data.scene import Scene, build_neighbor_tables, index_camera, stack_cameras


def test_ply_point_cloud_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(100, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (100, 3))
    path = str(tmp_path / "pc.ply")
    ply.store_point_cloud(path, xyz, rgb)
    pts, cols, normals = ply.fetch_point_cloud(path)
    np.testing.assert_allclose(pts, xyz, atol=1e-6)
    np.testing.assert_allclose(cols * 255, rgb, atol=0.5)
    assert normals.shape == (100, 3)


def test_ply_gaussian_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    n, K = 17, 16
    data = dict(
        xyz=rng.normal(size=(n, 3)), f_dc=rng.normal(size=(n, 1, 3)),
        f_rest=rng.normal(size=(n, K - 1, 3)), opacity=rng.normal(size=(n, 1)),
        scaling=rng.normal(size=(n, 3)), rotation=rng.normal(size=(n, 4)),
        albedo=rng.normal(size=(n, 3)), roughness=rng.normal(size=(n, 1)),
        metallic=rng.normal(size=(n, 1)))
    data = {k: v.astype(np.float32) for k, v in data.items()}
    path = str(tmp_path / "gauss.ply")
    ply.save_gaussian_ply(path, data["xyz"], data["f_dc"], data["f_rest"],
                          data["opacity"], data["scaling"], data["rotation"],
                          data["albedo"], data["roughness"], data["metallic"])
    out = ply.load_gaussian_ply(path)
    for k in data:
        np.testing.assert_allclose(out[k], data[k], atol=1e-6, err_msg=k)


def test_ply_mesh_roundtrip(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    path = str(tmp_path / "mesh.ply")
    ply.store_mesh(path, verts, faces, colors=np.ones((4, 3)) * 0.5)
    v, f, c = ply.fetch_mesh(path)
    np.testing.assert_allclose(v, verts)
    np.testing.assert_array_equal(f, faces)
    assert c is not None and abs(c[0, 0] - 0.5) < 0.01


def test_colmap_roundtrip(tmp_path):
    cams = {1: cm.ColmapCamera(1, "PINHOLE", 640, 480,
                               np.array([500.0, 510.0, 320.0, 240.0]))}
    q = cm.rotmat_to_qvec(np.eye(3))
    imgs = {1: cm.ColmapImage(1, q, np.array([0.1, 0.2, 0.3]), 1, "a.png"),
            2: cm.ColmapImage(2, q, np.array([1.0, 0.0, 0.0]), 1, "b.png")}
    cm.write_cameras_binary(str(tmp_path / "cameras.bin"), cams)
    cm.write_images_binary(str(tmp_path / "images.bin"), imgs)
    xyz = np.random.default_rng(0).normal(size=(20, 3))
    cm.write_points3d_binary(str(tmp_path / "points3D.bin"), xyz,
                             np.full((20, 3), 128))
    c2 = cm.read_cameras_binary(str(tmp_path / "cameras.bin"))
    i2 = cm.read_images_binary(str(tmp_path / "images.bin"))
    x2, rgb2, err2 = cm.read_points3d_binary(str(tmp_path / "points3D.bin"))
    assert c2[1].model == "PINHOLE" and c2[1].width == 640
    np.testing.assert_allclose(c2[1].params, cams[1].params)
    assert i2[2].name == "b.png"
    np.testing.assert_allclose(i2[1].tvec, [0.1, 0.2, 0.3])
    np.testing.assert_allclose(x2, xyz)
    assert rgb2[0, 0] == 128


def test_qvec_rotmat_roundtrip():
    rng = np.random.default_rng(2)
    for _ in range(5):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        R = cm.qvec_to_rotmat(q)
        q2 = cm.rotmat_to_qvec(R)
        # q and -q are the same rotation.
        assert min(np.abs(q - q2).max(), np.abs(q + q2).max()) < 1e-9


def test_pick_resolution():
    assert pick_resolution(1600, 1200, 2) == (800, 600)
    assert pick_resolution(3200, 2400, -1) == (1600, 1200)
    assert pick_resolution(800, 600, -1) == (800, 600)
    assert pick_resolution(1600, 1200, 400) == (400, 300)


@pytest.fixture(scope="module")
def synthetic_scene(tmp_path_factory):
    from tests.make_synthetic_scene import build
    out = str(tmp_path_factory.mktemp("scene"))
    return build(out, n_views=8, width=48, height=32, n_points=120)


def test_colmap_scene_reader(synthetic_scene):
    info = read_colmap_scene(synthetic_scene, eval_split=True)
    assert len(info.train_cameras) == 7
    assert len(info.test_cameras) == 1
    assert info.points.shape[1] == 3
    assert info.radius > 0
    assert os.path.exists(info.ply_path)


def test_scene_assembly_and_neighbors(synthetic_scene):
    mc = ModelConfig(source_path=synthetic_scene, resolution=1)
    # 8 ring views are 45 deg apart: widen the default 30 deg angle cut.
    opt = OptimConfig(multi_view_max_dist=100.0, nearby_cam_max_dist=100.0,
                      multi_view_max_angle=100.0, nearby_cam_max_angle=100.0)
    scene = Scene(mc, opt)
    V = len(scene.train_cameras)
    assert scene.gt_images.shape == (V, 3, 32, 48)
    assert scene.gray_images.shape == (V, 1, 32, 48)
    assert scene.nearest_table.shape == (V, opt.multi_view_num)
    # Ring cameras: every view has some valid neighbors.
    assert bool(scene.nearest_mask.any(axis=1).all())
    assert bool(scene.nearby_mask.any(axis=1).all())
    # Stacked camera indexing matches the per-view camera.
    cam0 = index_camera(scene.camera_stack, 0)
    np.testing.assert_allclose(np.asarray(cam0.world_view),
                               np.asarray(scene.train_cameras[0].world_view))


def test_scene_gt_matches_render(synthetic_scene):
    # The dataset was rendered from known Gaussians: re-rendering the true
    # cloud from a train view must reproduce the stored PNG (8-bit quantized).
    import jax.numpy as jnp

    from gs2m_tpu.core.camera import Camera
    from gs2m_tpu.core.gaussians import Gaussians
    from gs2m_tpu.ops.projection import project
    from gs2m_tpu.ops.rasterize import build_features, rasterize_from_projected
    from tests.make_synthetic_scene import make_scene_data

    mc = ModelConfig(source_path=synthetic_scene, resolution=1)
    scene = Scene(mc, shuffle=False)
    pts, cols = make_scene_data(120)
    g = Gaussians.create(pts, cols, max_sh_degree=1, capacity=pts.shape[0])
    cam = scene.train_cameras[0]
    proj = project(g, cam, 1)
    out = rasterize_from_projected(
        proj, jnp.minimum(g.get_opacity[:, 0] * 6.0, 0.99),
        build_features(g, cam), jnp.zeros(3), cam, feature_count=1,
        chunk=64, instance_cap=2 ** 15, backend="xla")
    gt = np.asarray(scene.gt_images[0])
    re = np.clip(np.asarray(out.color), 0, 1)
    assert np.abs(gt - re).max() < 2.5 / 255.0


def test_glossy_scene_builder(tmp_path):
    """build_glossy: COLMAP layout + masks + view-dependent speculars (two
    opposite views must disagree on the sphere far beyond albedo noise) and
    a Scene loads it with mask_gt."""
    import jax.numpy as jnp
    from PIL import Image

    from gs2m_tpu.core.config import ModelConfig
    from gs2m_tpu.data.scene import Scene
    from tests.make_synthetic_scene import analytic_env, build_glossy

    out = str(tmp_path / "glossy")
    build_glossy(out, n_views=6, width=96, height=72, n_points=3000)
    assert os.path.exists(os.path.join(out, "gt_material.json"))

    # View dependence: same camera ring position, opposite side.
    a = np.asarray(Image.open(os.path.join(out, "images", "view_000.png")),
                   np.float32) / 255.0
    b = np.asarray(Image.open(os.path.join(out, "images", "view_002.png")),
                   np.float32) / 255.0
    assert np.abs(a - b).max() > 0.2

    mc = ModelConfig(source_path=out, resolution=1, sh_degree=1,
                     mask_gt=True, masks="masks", white_background=True)
    scene = Scene(mc, shuffle=False)
    assert scene.gt_images.shape[0] == 6
    assert float(scene.alpha_masks.max()) > 0.9

    # analytic_env: positive, lobes make it anisotropic.
    d = np.eye(3)
    e = analytic_env(d)
    assert (e > 0).all() and e.std() > 0.05


def test_composite_scene_builder(tmp_path):
    """Composite scene (sphere + box + ground plane): samplers land exactly
    on the analytic surface, invisible regions are excluded, the builder
    writes a loadable COLMAP scene, and the chamfer helpers round-trip
    (surface samples -> ~0 distance; offset points -> that offset)."""
    from gs2m_tpu.core.config import ModelConfig
    from gs2m_tpu.data.scene import Scene
    from tests.make_synthetic_scene import (COMPOSITE, build,
                                            composite_surface_distance,
                                            sample_composite_surface)

    s = sample_composite_surface(4000, seed=5).astype(np.float64)
    d = composite_surface_distance(s)
    assert d.max() < 1e-6

    # Visible-surface exclusions: no sphere contact cap, no box bottom
    # face, no plane points under either object footprint.
    c = COMPOSITE
    on_pln = np.abs(s[:, 1] - c["ground_y"]) < 1e-9
    on_sph = np.abs(np.linalg.norm(s - c["sphere_c"], axis=1)
                    - c["sphere_r"]) < 1e-6
    assert (s[on_sph, 1] < c["ground_y"] - c["contact_eps"] + 1e-9).all()
    pf = s[on_pln]
    assert (np.linalg.norm(pf[:, [0, 2]] - c["sphere_c"][[0, 2]], axis=1)
            > c["sphere_r"]).all()
    on_box = ~(on_pln | on_sph)
    assert not np.isclose(s[on_box, 1], c["box_c"][1] + c["box_h"][1]).any()

    # Distance metric: a uniform offset off the plane reads back exactly.
    probe = pf[:50] - np.array([0.0, 0.1, 0.0])
    dd = composite_surface_distance(probe)
    # min-over-primitives: never farther than the lifted height, and for
    # most probes the plane itself is the nearest primitive.
    assert (dd <= 0.1 + 1e-9).all()
    assert np.median(np.abs(dd - 0.1)) < 1e-9

    out = str(tmp_path / "composite")
    build(out, n_views=4, width=96, height=72, n_points=2500,
          scene="composite", opacity_boost=8.0, point_scale=0.077,
          instance_cap=2 ** 15)
    mc = ModelConfig(source_path=out, resolution=1, sh_degree=1)
    scene = Scene(mc, shuffle=False)
    assert scene.gt_images.shape[0] == 4
    # The scene must not be trivially dark or flat.
    g = np.asarray(scene.gt_images)
    assert g.max() > 0.3 and g.std() > 0.05
