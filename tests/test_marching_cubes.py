import jax.numpy as jnp
import numpy as np
import pytest

from azurekinect3dreconstruction_tpu.config import TSDFConfig
from azurekinect3dreconstruction_tpu.core.camera import Intrinsics, pixel_rays
from azurekinect3dreconstruction_tpu.io.synthetic import Scene, Sphere, SyntheticCamera, orbit_trajectory
from azurekinect3dreconstruction_tpu.tsdf import hash as vhash
from azurekinect3dreconstruction_tpu.tsdf import marching_cubes as mc
from azurekinect3dreconstruction_tpu.tsdf import volume as tsdf
from test_mc_tables import numpy_marching_cubes


CFG = TSDFConfig(
    voxel_size=0.02,
    sdf_trunc=0.08,
    block_resolution=8,
    block_capacity=512,
    hash_capacity=2048,
)


def build_volume_from_field(field, cfg):
    """Fill a TSDFVolume from a dense field sampled at voxel centers of the
    grid [0..nx) x [0..ny) x [0..nz) (block-aligned)."""
    R = cfg.block_resolution
    nx, ny, nz = field.shape
    assert nx % R == ny % R == nz % R == 0
    bx, by, bz = nx // R, ny // R, nz // R
    vol = tsdf.create(cfg)
    coords = np.stack(np.meshgrid(np.arange(bx), np.arange(by), np.arange(bz),
                                  indexing="ij"), -1).reshape(-1, 3).astype(np.int32)
    keys = vhash.pack_key(jnp.asarray(coords))
    table, counter, vals, ovf = vhash.insert(
        vol.table, vol.n_blocks, keys, jnp.int32(cfg.block_capacity)
    )
    assert not bool(ovf)
    vals_np = np.asarray(vals)
    n = coords.shape[0]
    tsdf_arr = np.asarray(vol.tsdf).copy()
    w_arr = np.asarray(vol.weight).copy()
    col_arr = np.asarray(vol.color).copy()
    bc = np.asarray(vol.block_coords).copy()
    for i in range(n):
        cx, cy, cz = coords[i] * R
        blockvals = field[cx : cx + R, cy : cy + R, cz : cz + R].reshape(-1)
        tsdf_arr[vals_np[i]] = blockvals.reshape(tsdf_arr.shape[1:])
        w_arr[vals_np[i]] = 1.0
        col_arr[vals_np[i]] = 0.5
        bc[vals_np[i]] = coords[i]
    return vol._replace(
        table_keys=table.keys, table_vals=table.vals, n_blocks=counter,
        block_coords=jnp.asarray(bc), tsdf=jnp.asarray(tsdf_arr),
        weight=jnp.asarray(w_arr), color=jnp.asarray(col_arr),
    )


def test_extraction_matches_dense_numpy_mc():
    """Device block-wise MC must produce exactly the dense-grid numpy MC
    triangles (same tables, same interpolation, cross-block cells included)."""
    R = CFG.block_resolution
    n = 4 * R  # 32^3 voxels = 4^3 blocks
    g = (np.arange(n) + 0.5) * CFG.voxel_size
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    c = n * CFG.voxel_size / 2
    field = (np.sqrt((X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2) - 0.22) / CFG.sdf_trunc
    field = np.clip(field, -1, 1).astype(np.float32)

    vol = build_volume_from_field(field, CFG)
    mesh = mc.extract_mesh(vol, CFG, max_cells=16384, max_tris=32768)
    nt = int(mesh.num_triangles)
    assert nt > 100
    got = np.asarray(mesh.vertices)[: 3 * nt].reshape(nt, 3, 3)

    ref = numpy_marching_cubes(field, origin=0.5 * CFG.voxel_size, spacing=CFG.voxel_size)
    assert nt == len(ref)

    def canon(tris):
        v = np.round(tris.reshape(-1, 3), 6)
        return v[np.lexsort(v.T)]

    np.testing.assert_allclose(canon(got), canon(ref), atol=1e-5)


def test_extracted_sphere_rmse_under_one_voxel():
    scene = Scene(spheres=(Sphere((0.0, 0.0, 1.2), 0.3, (0.9, 0.2, 0.1)),))
    intr = Intrinsics.azure_kinect_depth_nfov().scaled(0.25)
    cam = SyntheticCamera(scene=scene, intrinsics=intr)
    rays = pixel_rays(intr)
    vol = tsdf.create(TSDFConfig(voxel_size=0.02, sdf_trunc=0.08, block_resolution=8,
                                 block_capacity=2048, hash_capacity=8192))
    cfg = TSDFConfig(voxel_size=0.02, sdf_trunc=0.08, block_resolution=8,
                     block_capacity=2048, hash_capacity=8192)
    for T in orbit_trajectory(7, radius=0.35, center=(0.0, 0.0, 1.2), angle_span=1.5):
        z, col = cam.render(np.asarray(T, np.float32))
        vol = tsdf.integrate_frame(vol, z, col, rays, np.asarray(T, np.float32), intr, cfg)
    mesh = mc.extract_mesh(vol, cfg, max_cells=65536, max_tris=131072)
    nt = int(mesh.num_triangles)
    assert nt > 1000
    v = np.asarray(mesh.vertices)[: 3 * nt]
    d = np.linalg.norm(v - np.array([0.0, 0.0, 1.2]), axis=1) - 0.3
    rmse = float(np.sqrt((d**2).mean()))
    assert rmse < cfg.voxel_size, f"mesh RMSE {rmse} >= 1 voxel"
    # colors sampled from the render must stay in range and be reddish
    cols = np.asarray(mesh.vertex_colors)[: 3 * nt]
    assert cols.min() >= 0.0 and cols.max() <= 1.0
    assert cols[:, 0].mean() > cols[:, 2].mean()


def test_overflow_flag_and_autogrow():
    R = CFG.block_resolution
    n = 2 * R
    g = (np.arange(n) + 0.5) * CFG.voxel_size
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    c = n * CFG.voxel_size / 2
    field = np.clip(
        (np.sqrt((X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2) - 0.1) / CFG.sdf_trunc, -1, 1
    ).astype(np.float32)
    vol = build_volume_from_field(field, CFG)
    # tiny budget must overflow...
    _, _, nt, ovf = mc.extract_mesh_arrays(vol, CFG, max_cells=64, max_tris=64)
    assert bool(ovf)
    # ...and auto_grow must recover the full mesh
    mesh = mc.extract_mesh(vol, CFG, max_cells=64, max_tris=64, auto_grow=True)
    ref = numpy_marching_cubes(field, origin=0.5 * CFG.voxel_size, spacing=CFG.voxel_size)
    assert int(mesh.num_triangles) == len(ref)


def test_count_active_bricks_matches_overflow_boundary():
    """count_active_bricks must agree EXACTLY with stage 1's own worklist:
    a cell budget of count*64 fits, (count-1)*64 overflows — that is the
    contract budget-fitting callers (bench.py) rely on."""
    R = CFG.block_resolution
    n = 3 * R
    g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    field = np.minimum(
        np.linalg.norm(g - n / 2.0, axis=0) - n / 4.0, 1.0) / 4.0
    field = np.clip(field, -1.0, 1.0)
    vol = build_volume_from_field(field, CFG)
    E = mc.snap_extract_blocks(int(vol.n_blocks), CFG.block_capacity)
    nb = int(mc.count_active_bricks(vol, CFG, extract_blocks=E))
    assert nb > 2
    *_r, ovf_fit = mc.extract_mesh_arrays(
        vol, CFG, max_cells=nb * 64, max_tris=1 << 16, extract_blocks=E)
    *_r2, ovf_tight = mc.extract_mesh_arrays(
        vol, CFG, max_cells=(nb - 1) * 64, max_tris=1 << 16,
        extract_blocks=E)
    assert not bool(ovf_fit)
    assert bool(ovf_tight)


def test_weld_vertices_preserves_geometry():
    R = CFG.block_resolution
    n = 2 * R
    g = (np.arange(n) + 0.5) * CFG.voxel_size
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    c = n * CFG.voxel_size / 2
    field = np.clip(
        (np.sqrt((X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2) - 0.1) / CFG.sdf_trunc, -1, 1
    ).astype(np.float32)
    vol = build_volume_from_field(field, CFG)
    mesh = mc.extract_mesh(vol, CFG, max_cells=16384, max_tris=32768).compact()
    welded = mc.weld_vertices(mesh)
    assert welded.vertices.shape[0] < mesh.vertices.shape[0]
    # triangle geometry identical
    np.testing.assert_allclose(
        np.sort(welded.vertices[welded.triangles].reshape(-1, 3), axis=0),
        np.sort(mesh.vertices[mesh.triangles].reshape(-1, 3), axis=0),
        atol=1e-5,
    )
    # welded soup must be closed (full sphere inside the grid)
    edges = np.concatenate([
        welded.triangles[:, [0, 1]], welded.triangles[:, [1, 2]], welded.triangles[:, [2, 0]]
    ])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts % 2 == 0).all()


def _sphere_volume(n_mult=4, radius=0.22):
    R = CFG.block_resolution
    n = n_mult * R
    g = (np.arange(n) + 0.5) * CFG.voxel_size
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    c = n * CFG.voxel_size / 2
    field = (np.sqrt((X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2)
             - radius) / CFG.sdf_trunc
    return build_volume_from_field(np.clip(field, -1, 1).astype(np.float32),
                                   CFG)


def test_block_sampled_model_matches_prefix_when_unthinned():
    """extract_sampled_surface_model (the f2m refresh path) must be
    BIT-IDENTICAL to the full-prefix device sampler when nothing thins:
    every alive block within reach and <= sample_blocks, bricks within
    budget, triangles within budget. The compact selection then IS the
    alive prefix (sample_block_selection docstring)."""
    vol = _sphere_volume()
    E = mc.snap_extract_blocks(int(vol.n_blocks), CFG.block_capacity)
    n_points = 3 * 65536  # far above the sphere's emission: no thinning
    hp, hm, hovf = mc.extract_surface_samples_device(
        vol, CFG, n_points, extract_blocks=E, max_cells=64 * 4096)
    sp, sm, sovf = mc.extract_sampled_surface_model(
        vol, CFG, n_points, jnp.eye(4, dtype=jnp.float32), reach=50.0,
        sample_blocks=128, bricks_per_block=CFG.block_resolution ** 3 // 64)
    np.testing.assert_array_equal(np.asarray(hm), np.asarray(sm))
    np.testing.assert_array_equal(np.asarray(hp)[np.asarray(hm)],
                                  np.asarray(sp)[np.asarray(sm)])
    assert not bool(hovf) and not bool(sovf)


def test_block_sampled_model_triangle_stride_is_uniform():
    """When only the TRIANGLE budget binds, the sample must be every
    stride-th triangle of the full emission in global order — uniform
    thinning, not a pool-order prefix (the r4 refresh's failure mode)."""
    vol = _sphere_volume()
    E = mc.snap_extract_blocks(int(vol.n_blocks), CFG.block_capacity)
    v, _c, nt, _o = mc.extract_mesh_arrays(
        vol, CFG, max_cells=64 * 4096, max_tris=65536, extract_blocks=E)
    nt = int(nt)
    assert nt > 64
    mtris = nt // 3  # forces stride 4 on the ceil ladder... exact: ceil
    sp, sm, sovf = mc.extract_sampled_surface_model(
        vol, CFG, 3 * mtris, jnp.eye(4, dtype=jnp.float32), reach=50.0,
        sample_blocks=128, bricks_per_block=CFG.block_resolution ** 3 // 64)
    s = -(-nt // mtris)  # stride the stage picks
    want = np.asarray(v)[:, :, ::s][:, :, :mtris]  # (3, 3, <=mtris)
    kept = np.asarray(sp)[np.asarray(sm)]
    np.testing.assert_array_equal(
        kept, want.transpose(2, 0, 1).reshape(-1, 3)[: len(kept)])
    assert len(kept) == 3 * min(-(-nt // s), mtris)
    assert not bool(sovf), "ceil-stride cannot overflow"


def test_block_sampled_model_view_local_and_covers():
    """A long slab: (a) tight budgets thin UNIFORMLY (the sample spans the
    whole extent, not the oldest corner); (b) a small reach keeps only
    nearby geometry."""
    R = CFG.block_resolution
    nx, nyz = 16 * R, 2 * R
    g = lambda n: (np.arange(n) + 0.5) * CFG.voxel_size
    X, Y, Z = np.meshgrid(g(nx), g(nyz), g(nyz), indexing="ij")
    mid = nyz * CFG.voxel_size / 2
    field = np.clip((Y - mid) / CFG.sdf_trunc, -1, 1).astype(np.float32)
    vol = build_volume_from_field(field, CFG)
    extent = nx * CFG.voxel_size  # 2.56 m of surface along x
    T = jnp.eye(4, dtype=jnp.float32)

    pts, mask, ovf = mc.extract_sampled_surface_model(
        vol, CFG, 384, T, reach=50.0, sample_blocks=16, bricks_per_block=2,
        supplier_rows=112)
    kept = np.asarray(pts)[np.asarray(mask)]
    assert len(kept) > 64
    assert kept[:, 0].max() > 0.8 * extent, "sample biased to oldest blocks"
    assert kept[:, 0].min() < 0.2 * extent
    assert not bool(ovf)

    pts2, mask2, _ = mc.extract_sampled_surface_model(
        vol, CFG, 384, T, reach=0.6, sample_blocks=64)
    kept2 = np.asarray(pts2)[np.asarray(mask2)]
    assert len(kept2) > 0
    reach_pad = 0.6 + CFG.block_resolution * CFG.voxel_size
    assert (np.linalg.norm(kept2, axis=1) <= reach_pad).all(), \
        "sampled surface leaked outside the view-local radius"


def test_surface_sampler_device_matches_host():
    """The zero-sync device sampler (extract_surface_samples_device — the
    frame-to-model refresh path) must reproduce the host sampler bit-exactly
    when given the same extraction prefix: same stride ladder, same indices,
    same mask arithmetic, only where the scalars live differs. Checked at a
    budget that forces stride > 1 (the interesting branch) and one that
    keeps stride == 1."""
    R = CFG.block_resolution
    n = 4 * R
    g = (np.arange(n) + 0.5) * CFG.voxel_size
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    c = n * CFG.voxel_size / 2
    field = (np.sqrt((X - c) ** 2 + (Y - c) ** 2 + (Z - c) ** 2) - 0.22) / CFG.sdf_trunc
    field = np.clip(field, -1, 1).astype(np.float32)
    vol = build_volume_from_field(field, CFG)
    E = mc.snap_extract_blocks(int(vol.n_blocks), CFG.block_capacity)
    for budget in (512, 4096, 65536):  # strides 4, 2/4, 1 on this scene
        hp, hm, hovf = mc.extract_surface_samples(vol, CFG, budget,
                                                  max_cells=16384)
        dp, dm, dovf = mc.extract_surface_samples_device(
            vol, CFG, budget, extract_blocks=E, max_cells=16384)
        np.testing.assert_array_equal(np.asarray(hm), np.asarray(dm))
        np.testing.assert_array_equal(np.asarray(hp)[np.asarray(hm)],
                                      np.asarray(dp)[np.asarray(dm)])
        assert bool(hovf) == bool(dovf)
