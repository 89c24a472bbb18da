"""Validate the generated marching-cubes tables by meshing analytic fields
with a simple numpy extractor and checking topology + geometry."""

import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.tsdf import mc_tables as mt


def numpy_marching_cubes(field, origin=0.0, spacing=1.0):
    """Dense-grid MC over field[X, Y, Z] (inside = field < 0). Triangle soup."""
    X, Y, Z = field.shape
    verts = []
    for cx in range(X - 1):
        for cy in range(Y - 1):
            for cz in range(Z - 1):
                corners = np.array(
                    [field[cx + ox, cy + oy, cz + oz] for ox, oy, oz in mt.CORNER_OFFSETS]
                )
                cfg = sum(1 << k for k in range(8) if corners[k] < 0)
                for t in range(mt.TRI_COUNT[cfg]):
                    for v in range(3):
                        e = mt.TRI_TABLE[cfg, 3 * t + v]
                        a, b = mt.EDGE_ENDPOINTS[e]
                        va, vb = corners[a], corners[b]
                        frac = va / (va - vb)
                        p = mt.CORNER_OFFSETS[a] + frac * (
                            mt.CORNER_OFFSETS[b] - mt.CORNER_OFFSETS[a]
                        )
                        verts.append((np.array([cx, cy, cz]) + p) * spacing + origin)
    return np.array(verts).reshape(-1, 3, 3)  # (T, 3 verts, 3)


def mesh_topology(tris, decimals=6):
    """Return (n_odd_edges, n_nonmanifold_edges, euler_characteristic).

    odd edges (count 1 or 3) mean a hole; even counts > 2 are two sheets
    kissing along a cube edge — geometrically closed, standard for MC."""
    flat = tris.reshape(-1, 3)
    keys = np.round(flat, decimals)
    uniq, idx = np.unique(keys, axis=0, return_inverse=True)
    f = idx.reshape(-1, 3)
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    e_uniq, counts = np.unique(edges, axis=0, return_counts=True)
    odd = int((counts % 2 == 1).sum())
    nonmanifold = int((counts > 2).sum())
    euler = len(uniq) - len(e_uniq) + len(f)
    return odd, nonmanifold, euler


def sphere_field(n=20, r=7.0):
    g = np.arange(n) - (n - 1) / 2.0
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    return np.sqrt(X**2 + Y**2 + Z**2) - r


def test_tables_shape_and_bounds():
    assert mt.TRI_TABLE.shape == (256, 15)
    assert mt.TRI_COUNT.shape == (256,)
    assert mt.TRI_COUNT[0] == 0 and mt.TRI_COUNT[255] == 0
    used = mt.TRI_TABLE[mt.TRI_TABLE >= 0]
    assert used.max() < 12
    # every slot below 3*count is a valid edge, everything after is -1
    for cfg in range(256):
        c = mt.TRI_COUNT[cfg]
        assert (mt.TRI_TABLE[cfg, : 3 * c] >= 0).all()
        assert (mt.TRI_TABLE[cfg, 3 * c :] == -1).all()


def test_single_corner_cases():
    """One inside corner -> one triangle whose vertices lie on the 3 edges
    incident to that corner."""
    for k in range(8):
        cfg = 1 << k
        assert mt.TRI_COUNT[cfg] == 1
        edges = set(mt.TRI_TABLE[cfg, :3].tolist())
        incident = {i for i, (a, b) in enumerate(mt.EDGE_ENDPOINTS) if k in (a, b)}
        assert edges == incident


def test_sphere_watertight_and_accurate():
    field = sphere_field()
    tris = numpy_marching_cubes(field)
    assert len(tris) > 100
    boundary, nonmanifold, euler = mesh_topology(tris)
    assert boundary == 0, "surface has holes"
    assert nonmanifold == 0
    assert euler == 2, f"sphere Euler characteristic {euler} != 2"
    # geometric accuracy: all vertices within half a cell of the true sphere
    v = tris.reshape(-1, 3) - (20 - 1) / 2.0
    d = np.abs(np.linalg.norm(v, axis=1) - 7.0)
    assert d.max() < 0.5
    assert np.sqrt((d**2).mean()) < 0.1


def test_sphere_normals_point_outward():
    field = sphere_field()
    tris = numpy_marching_cubes(field)
    c = (20 - 1) / 2.0
    p0, p1, p2 = tris[:, 0], tris[:, 1], tris[:, 2]
    n = np.cross(p1 - p0, p2 - p0)
    centroid = tris.mean(axis=1) - c
    dots = (n * centroid).sum(axis=1)
    assert (dots > 0).all(), "winding must face the +field (outside) region"


@pytest.mark.parametrize("seed", range(3))
def test_random_field_watertight(seed):
    """Random smooth fields: surface must always be closed & manifold —
    this exercises every ambiguous-face resolution path."""
    rng = np.random.RandomState(seed)
    n = 12
    field = rng.normal(size=(n, n, n))
    # smooth a little so surfaces are not pure noise
    for ax in range(3):
        field = (np.roll(field, 1, ax) + field + np.roll(field, -1, ax)) / 3.0
    # close the boundary: padding with +1 guarantees no open edges at the border
    f = np.pad(field, 1, constant_values=1.0)
    tris = numpy_marching_cubes(f)
    odd, nonmanifold, euler = mesh_topology(tris)
    assert odd == 0, "open (odd-degree) edges mean the surface leaks"


def test_two_blobs_two_components():
    g = np.arange(24) - 11.5
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    f1 = np.sqrt((X + 6) ** 2 + Y**2 + Z**2) - 3.0
    f2 = np.sqrt((X - 6) ** 2 + Y**2 + Z**2) - 3.0
    field = np.minimum(f1, f2)
    tris = numpy_marching_cubes(field)
    boundary, nonmanifold, euler = mesh_topology(tris)
    assert boundary == 0
    assert euler == 4, "two disjoint spheres -> Euler 4"
