"""Marching tetrahedra over the block-sparse TSDF (table-free, vectorized).

Replaces Open3D's extract_triangle_mesh (reference render.py:173-176). Each
voxel cube is split into 6 tetrahedra around its main diagonal; per-tet
surface cases are derived programmatically (1/2/3-inside patterns), so no
256-entry marching-cubes tables are needed. Cross-block continuity comes
from stitching one-voxel overlaps from +x/+y/+z neighbor blocks before
extraction. Vertices are welded by exact position so the cluster
post-process sees a connected mesh.
"""
from __future__ import annotations

import numpy as np

from gs2m_tpu.mesh.tsdf import BLOCK_EDGE, TSDFVolume

# Cube corners numbered by bits: x -> 1, y -> 2, z -> 4.
_CUBE_OFFSETS = np.array([[x, y, z] for z in (0, 1) for y in (0, 1)
                          for x in (0, 1)])[np.argsort(
    [x + 2 * y + 4 * z for z in (0, 1) for y in (0, 1) for x in (0, 1)])]
# 6-tet decomposition around the 0-7 diagonal.
_TETS = np.array([[0, 5, 1, 7], [0, 1, 3, 7], [0, 3, 2, 7],
                  [0, 2, 6, 7], [0, 6, 4, 7], [0, 4, 5, 7]])


def _tet_case_table():
    """For each 4-bit inside pattern: up to 2 triangles, each 3 edges (a, b)
    with a inside, b outside; plus triangle count."""
    edges = np.zeros((16, 2, 3, 2), np.int64)
    counts = np.zeros(16, np.int64)
    for case in range(16):
        inside = [i for i in range(4) if case >> i & 1]
        outside = [i for i in range(4) if not case >> i & 1]
        tris = []
        if len(inside) == 1:
            a = inside[0]
            tris = [[(a, outside[0]), (a, outside[1]), (a, outside[2])]]
        elif len(inside) == 3:
            b = outside[0]
            # Orientation flipped relative to the 1-inside case.
            tris = [[(inside[0], b), (inside[2], b), (inside[1], b)]]
        elif len(inside) == 2:
            a, b = inside
            c, d = outside
            tris = [[(a, c), (b, c), (b, d)], [(a, c), (b, d), (a, d)]]
        counts[case] = len(tris)
        for t, tri in enumerate(tris):
            edges[case, t] = tri
    return edges, counts


_EDGES, _COUNTS = _tet_case_table()


def _stitch_blocks(vol: TSDFVolume):
    """(B, E+1, E+1, E+1) padded sdf/weight/color grids with +1 overlap."""
    E = BLOCK_EDGE
    B = vol.block_coords.shape[0]
    idx = {tuple(c): i for i, c in enumerate(vol.block_coords)}
    sdf = np.zeros((B, E + 1, E + 1, E + 1), np.float32)
    w = np.zeros((B, E + 1, E + 1, E + 1), np.float32)
    col = np.zeros((B, E + 1, E + 1, E + 1, 3), np.float32)

    def own(a):
        return a.reshape(B, E, E, E, *a.shape[2:])  # z, y, x order

    sdf_b = vol.tsdf.reshape(B, E, E, E)
    w_b = vol.weight.reshape(B, E, E, E)
    c_b = vol.color.reshape(B, E, E, E, 3)
    sdf[:, :E, :E, :E] = sdf_b
    w[:, :E, :E, :E] = w_b
    col[:, :E, :E, :E] = c_b

    # Fill overlap faces/edges/corner from up to 7 neighbors.
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                if dx == dy == dz == 0:
                    continue
                for i, c in enumerate(vol.block_coords):
                    j = idx.get((c[0] + dx, c[1] + dy, c[2] + dz))
                    if j is None:
                        continue
                    zs = slice(E, E + 1) if dz else slice(0, E)
                    ys = slice(E, E + 1) if dy else slice(0, E)
                    xs = slice(E, E + 1) if dx else slice(0, E)
                    zsrc = slice(0, 1) if dz else slice(0, E)
                    ysrc = slice(0, 1) if dy else slice(0, E)
                    xsrc = slice(0, 1) if dx else slice(0, E)
                    sdf[i, zs, ys, xs] = sdf_b[j][zsrc, ysrc, xsrc]
                    w[i, zs, ys, xs] = w_b[j][zsrc, ysrc, xsrc]
                    col[i, zs, ys, xs] = c_b[j][zsrc, ysrc, xsrc]
    return sdf, w, col


def marching_tetrahedra_blocks(vol: TSDFVolume, weight_threshold: float = 0.0):
    """-> (vertices (N, 3), faces (M, 3), colors (N, 3)). Empty mesh if no
    surface crossing."""
    E = BLOCK_EDGE
    B = vol.block_coords.shape[0]
    if B == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64),
                np.zeros((0, 3), np.float32))
    sdf, w, col = _stitch_blocks(vol)

    # Cube corner grids: (B, E, E, E, 8).
    def corners(a):
        out = [a[:, oz:oz + E, oy:oy + E, ox:ox + E] for ox, oy, oz in _CUBE_OFFSETS]
        return np.stack(out, axis=4)

    c_sdf = corners(sdf).reshape(-1, 8)
    c_w = corners(w).reshape(-1, 8)
    c_col = corners(col[..., 0]), corners(col[..., 1]), corners(col[..., 2])
    c_col = np.stack([c.reshape(-1, 8) for c in c_col], -1)  # (M, 8, 3)

    # World positions of cube corners.
    r = np.arange(E)
    zz, yy, xx = np.meshgrid(r, r, r, indexing="ij")
    base = np.stack([xx, yy, zz], -1)[None] + vol.block_coords[:, None, None, None] * E
    base = base.reshape(-1, 1, 3) + _CUBE_OFFSETS[None]  # (M, 8, 3) voxel idx
    c_pos = (base + 0.5) * vol.voxel_size

    valid_cube = (c_w > weight_threshold).all(axis=1)
    keep = valid_cube & (np.sign(c_sdf.max(1)) != np.sign(c_sdf.min(1)))
    c_sdf, c_pos, c_col = c_sdf[keep], c_pos[keep], c_col[keep]
    M = c_sdf.shape[0]
    if M == 0:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64),
                np.zeros((0, 3), np.float32))

    tris = []
    tri_cols = []
    for tet in _TETS:
        s = c_sdf[:, tet]              # (M, 4)
        p = c_pos[:, tet]              # (M, 4, 3)
        cc = c_col[:, tet]             # (M, 4, 3)
        inside = s < 0.0
        case = (inside * np.array([1, 2, 4, 8])).sum(1)
        for t in range(2):
            has = _COUNTS[case] > t
            if not has.any():
                continue
            e = _EDGES[case[has], t]   # (K, 3, 2) corner index pairs
            sk, pk, ck = s[has], p[has], cc[has]
            K = len(e)
            rows = np.arange(K)[:, None]
            sa = sk[rows, e[..., 0]]
            sb = sk[rows, e[..., 1]]
            tt = (sa / (sa - sb + 1e-12))[..., None]
            pa = pk[rows, e[..., 0]]
            pb = pk[rows, e[..., 1]]
            tris.append(pa + tt * (pb - pa))           # (K, 3, 3)
            ca = ck[rows, e[..., 0]]
            cb = ck[rows, e[..., 1]]
            tri_cols.append(ca + tt * (cb - ca))

    if not tris:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64),
                np.zeros((0, 3), np.float32))
    tri_pts = np.concatenate(tris, 0)          # (T, 3, 3)
    tri_col = np.concatenate(tri_cols, 0)

    # Weld identical vertices (edge intersections are shared exactly).
    flat = tri_pts.reshape(-1, 3)
    quant = np.round(flat / (vol.voxel_size * 1e-4)).astype(np.int64)
    uniq, inv = np.unique(quant, axis=0, return_inverse=True)
    verts = np.zeros((len(uniq), 3), np.float64)
    cols = np.zeros((len(uniq), 3), np.float64)
    cnt = np.zeros(len(uniq), np.float64)
    np.add.at(verts, inv, flat)
    np.add.at(cols, inv, tri_col.reshape(-1, 3))
    np.add.at(cnt, inv, 1.0)
    verts = (verts / cnt[:, None]).astype(np.float32)
    cols = (cols / cnt[:, None]).astype(np.float32)
    faces = inv.reshape(-1, 3)
    # Drop degenerate triangles.
    good = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
            & (faces[:, 0] != faces[:, 2]))
    return verts, faces[good].astype(np.int64), cols
