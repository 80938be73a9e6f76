"""Core math: SH evaluation, quaternion rotations, camera matrices, Gaussians."""
import jax
import jax.numpy as jnp
import numpy as np

from gs2m_tpu.core import sh as shlib
from gs2m_tpu.core.camera import Camera, projection_matrix, world_to_view_matrix
from gs2m_tpu.core.gaussians import Gaussians, quat_to_rotmat


def test_sh_degree0_constant():
    sh = np.zeros((4, 16, 3), np.float32)
    sh[:, 0, :] = 1.0
    dirs = np.random.default_rng(0).normal(size=(4, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = shlib.eval_sh(0, jnp.asarray(sh), jnp.asarray(dirs))
    np.testing.assert_allclose(out, shlib.C0, rtol=1e-6)


def test_sh_degree1_axis_values():
    # Band-1 basis at +z: only the z term (-C1*y, +C1*z, -C1*x) survives.
    sh = np.zeros((1, 4, 1), np.float32)
    sh[:, 2, 0] = 2.0  # the "z" coefficient slot
    dirs = np.array([[0.0, 0.0, 1.0]], np.float32)
    out = shlib.eval_sh(1, jnp.asarray(sh), jnp.asarray(dirs))
    np.testing.assert_allclose(out[0, 0], shlib.C1 * 2.0, rtol=1e-6)
    # And the x coefficient enters with a minus sign at +x.
    sh2 = np.zeros((1, 4, 1), np.float32)
    sh2[:, 3, 0] = 1.0
    out2 = shlib.eval_sh(1, jnp.asarray(sh2), jnp.asarray(np.array([[1.0, 0, 0]], np.float32)))
    np.testing.assert_allclose(out2[0, 0], -shlib.C1, rtol=1e-6)


def test_sh_rgb_roundtrip():
    rgb = jnp.asarray(np.random.default_rng(1).uniform(0.1, 0.9, (8, 3)).astype(np.float32))
    dc = shlib.rgb_to_sh_dc(rgb)
    np.testing.assert_allclose(shlib.sh_dc_to_rgb(dc), rgb, rtol=1e-5)
    # sh_to_rgb at degree 0 with DC-only coeffs reproduces the color.
    sh = jnp.zeros((8, 1, 3)).at[:, 0, :].set(dc)
    dirs = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))
    np.testing.assert_allclose(shlib.sh_to_rgb(0, sh, dirs), rgb, rtol=1e-5, atol=1e-6)


def test_quat_to_rotmat_orthonormal():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(16, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (16, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # Identity quaternion -> identity matrix.
    np.testing.assert_allclose(
        np.asarray(quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))), np.eye(3), atol=1e-7)
    # 90 deg about z: (cos45, 0, 0, sin45) maps x -> y.
    q90 = jnp.array([np.cos(np.pi / 4), 0.0, 0.0, np.sin(np.pi / 4)], jnp.float32)
    R90 = np.asarray(quat_to_rotmat(q90))
    np.testing.assert_allclose(R90 @ np.array([1.0, 0, 0]), np.array([0, 1.0, 0]), atol=1e-6)


def test_projection_matrix_depth_range():
    znear, zfar = 0.01, 100.0
    P = projection_matrix(znear, zfar, 1.0, 0.8)
    for z, expect in ((znear, 0.0), (zfar, 1.0)):
        clip = P @ np.array([0.0, 0.0, z, 1.0])
        np.testing.assert_allclose(clip[2] / clip[3], expect, atol=1e-6)


def test_camera_center_and_transforms():
    rng = np.random.default_rng(3)
    # Random look-at style camera.
    theta = 0.4
    R = np.array([[np.cos(theta), 0, np.sin(theta)], [0, 1, 0],
                  [-np.sin(theta), 0, np.cos(theta)]])  # c2w-ish rotation
    T = np.array([0.1, -0.2, 3.0])
    cam = Camera.create(R, T, fovx=1.2, fovy=0.9, width=64, height=48)
    # world_to_cam of the camera center is the origin.
    c = np.asarray(cam.cam_center)[None]
    np.testing.assert_allclose(np.asarray(cam.world_to_cam(jnp.asarray(c))), 0.0, atol=1e-5)
    # Round trip world -> cam -> world.
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    back = np.asarray(cam.cam_to_world(cam.world_to_cam(jnp.asarray(pts))))
    np.testing.assert_allclose(back, pts, atol=1e-4)
    # A point straight down the optical axis projects to the image center.
    p_axis = cam.cam_to_world(jnp.array([[0.0, 0.0, 5.0]]))
    hom = jnp.concatenate([p_axis, jnp.ones((1, 1))], -1) @ cam.full_proj
    ndc = hom[0, :3] / hom[0, 3]
    np.testing.assert_allclose(np.asarray(ndc[:2]), 0.0, atol=1e-5)


def test_gaussians_create_and_activations():
    rng = np.random.default_rng(4)
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.8, size=(20, 3)).astype(np.float32)
    g = Gaussians.create(pts, cols, max_sh_degree=3, capacity=32)
    assert g.capacity == 32
    assert int(g.num_alive) == 20
    assert g.features_rest.shape == (32, 15, 3)
    # Opacity: alive slots sigmoid(logit(0.1)) = 0.1, dead slots exactly 0.
    op = np.asarray(g.get_opacity)
    np.testing.assert_allclose(op[:20, 0], 0.1, atol=1e-5)
    np.testing.assert_allclose(op[20:, 0], 0.0)
    # DC features reproduce input colors.
    rgb = np.asarray(shlib.sh_dc_to_rgb(g.features_dc[:20, 0]))
    np.testing.assert_allclose(rgb, cols, atol=1e-5)
    # Covariance of an isotropic Gaussian is s^2 * I.
    cov = np.asarray(g.get_covariance())[:20]
    s2 = np.exp(2 * np.asarray(g.scaling[:20, 0]))
    np.testing.assert_allclose(cov[:, 0], s2, rtol=1e-4)
    np.testing.assert_allclose(cov[:, 3], s2, rtol=1e-4)
    np.testing.assert_allclose(cov[:, 5], s2, rtol=1e-4)
    np.testing.assert_allclose(cov[:, 1], 0.0, atol=1e-6)


def test_normals_shortest_axis_and_flip():
    # A disc-like Gaussian: tiny z-scale -> normal along +/- z, flipped toward camera.
    g = Gaussians(
        xyz=jnp.zeros((2, 3)),
        features_dc=jnp.zeros((2, 1, 3)),
        features_rest=jnp.zeros((2, 0, 3)),
        scaling=jnp.log(jnp.array([[1.0, 1.0, 0.01]] * 2)),
        rotation=jnp.array([[1.0, 0, 0, 0]] * 2),
        opacity=jnp.zeros((2, 1)),
        albedo=jnp.zeros((2, 3)),
        roughness=jnp.zeros((2, 1)),
        metallic=jnp.zeros((2, 1)),
        alive=jnp.ones((2,), bool),
        max_sh_degree=0,
    )
    n_front = np.asarray(g.get_normals(jnp.array([0.0, 0.0, 5.0])))
    np.testing.assert_allclose(n_front, np.tile([0, 0, 1.0], (2, 1)), atol=1e-6)
    n_back = np.asarray(g.get_normals(jnp.array([0.0, 0.0, -5.0])))
    np.testing.assert_allclose(n_back, np.tile([0, 0, -1.0], (2, 1)), atol=1e-6)


def test_fused_ssim_valid_padding():
    """padding="valid" (fused_ssim/__init__.py:34-41) averages only interior
    windows; numerically it is the crop of the same-padded map, and its
    gradient matches autodiff of that cropped mean."""
    import jax
    import jax.numpy as jnp

    from gs2m_tpu.ops.ssim import fused_ssim, ssim_map, _ssim_terms

    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 40)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (1, 3, 32, 40)).astype(np.float32))

    v = float(fused_ssim(a, b, padding="valid"))
    expect = float(jnp.mean(ssim_map(a, b)[:, :, 5:-5, 5:-5]))
    np.testing.assert_allclose(v, expect, rtol=1e-6)
    assert v != float(fused_ssim(a, b))  # differs from "same" on random data

    g_fused = jax.grad(lambda x: fused_ssim(x, b, padding="valid"))(a)
    g_auto = jax.grad(
        lambda x: jnp.mean(_ssim_terms(x, b)[0][:, :, 5:-5, 5:-5]))(a)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_auto),
                               atol=1e-6, rtol=1e-4)

    import pytest
    with pytest.raises(ValueError):
        fused_ssim(a, b, padding="reflect")


def test_grid_sample_matches_reference_fwd_and_grads():
    """The quad-pack/sort-segment grid sampler (custom_vjp) must match the
    plain-autodiff twin in forward AND both gradients, for border and zeros
    padding, including out-of-range and exact-integer coordinates."""
    import jax
    import jax.numpy as jnp

    from gs2m_tpu.ops.grid_sample import (grid_sample_bilinear,
                                          grid_sample_bilinear_reference)

    rng = np.random.default_rng(9)
    C, H, W = 3, 24, 31
    img = jnp.asarray(rng.normal(size=(C, H, W)).astype(np.float32))
    n = 500
    # Mix of interior, border, outside and exact-integer positions.
    gx = np.concatenate([rng.uniform(-1.3, 1.3, n - 40),
                         np.linspace(-1, 1, 20),
                         (2.0 * rng.integers(0, W, 20) / (W - 1) - 1.0)])
    gy = np.concatenate([rng.uniform(-1.3, 1.3, n - 40),
                         np.linspace(1, -1, 20),
                         (2.0 * rng.integers(0, H, 20) / (H - 1) - 1.0)])
    grid = jnp.asarray(np.stack([gx, gy], -1).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(n, C)).astype(np.float32))

    for mode in ("border", "zeros"):
        out = grid_sample_bilinear(img, grid, mode)
        ref = grid_sample_bilinear_reference(img, grid, mode)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6, rtol=1e-5, err_msg=mode)

        def loss(f, im, gr):
            return jnp.sum(f(im, gr, mode) * ct)

        g_img, g_grid = jax.grad(lambda im, gr: loss(
            grid_sample_bilinear, im, gr), argnums=(0, 1))(img, grid)
        r_img, r_grid = jax.grad(lambda im, gr: loss(
            grid_sample_bilinear_reference, im, gr), argnums=(0, 1))(img, grid)
        np.testing.assert_allclose(np.asarray(g_img), np.asarray(r_img),
                                   atol=1e-5, rtol=1e-4, err_msg=mode)
        np.testing.assert_allclose(np.asarray(g_grid), np.asarray(r_grid),
                                   atol=1e-5, rtol=1e-4, err_msg=mode)


def test_eval_sh_traced_degree_matches_static():
    """A TRACED sh degree (band masking, no recompile per bump) must equal
    the statically truncated polynomial for every degree."""
    import jax
    import jax.numpy as jnp

    from gs2m_tpu.core.sh import eval_sh

    rng = np.random.default_rng(2)
    sh = jnp.asarray(rng.normal(size=(64, 16, 3)).astype(np.float32))
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=1, keepdims=True))

    traced = jax.jit(eval_sh)  # deg becomes a traced scalar
    compiled_count = 0
    for deg in range(4):
        want = eval_sh(deg, sh, dirs)           # static truncation
        got = traced(jnp.int32(deg), sh, dirs)  # masked full evaluation
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, rtol=1e-5, err_msg=str(deg))
    # One compilation serves all degrees.
    assert traced._cache_size() == 1
