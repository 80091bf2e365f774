import numpy as np

from skyrim_tpu import grid as g


def test_latlon_canonical():
    grid = g.GRID_721x1440
    assert grid.lat[0] == 90.0 and grid.lat[-1] == -90.0
    assert len(grid.lat) == 721 and len(grid.lon) == 1440
    assert grid.lon[0] == 0.0 and grid.lon[-1] == 359.75
    assert grid.resolution_deg == 0.25


def test_latlon_no_south_pole():
    grid = g.GRID_720x1440
    assert len(grid.lat) == 720
    assert grid.lat[-1] == -89.75


def test_nearest_index():
    grid = g.GRID_721x1440
    i, j = grid.nearest_index(41.0, 29.0)
    assert abs(grid.lat[i] - 41.0) <= 0.125
    assert abs(grid.lon[j] - 29.0) <= 0.125
    # negative lon wraps
    _, j2 = grid.nearest_index(0.0, -0.25)
    assert grid.lon[j2] == 359.75


def test_area_weights():
    w = g.GRID_721x1440.cell_area_weights
    assert w.shape == (721,)
    np.testing.assert_allclose(w.sum(), 1.0, atol=1e-12)
    assert w[360] > w[0]  # equator cell bigger than pole cell
    np.testing.assert_allclose(w, w[::-1], atol=1e-12)  # symmetric


def test_cubed_sphere_latlon():
    cs = g.CubedSphereGrid(16)
    lat, lon = cs.latlon
    assert lat.shape == (6, 16, 16)
    assert lat.max() <= 90 and lat.min() >= -90
    assert np.all((lon >= 0) & (lon < 360))
    # north face contains the highest latitudes
    assert lat[4].max() > 80


def test_cubed_sphere_remap_roundtrip():
    """Constant fields must survive latlon→CS→latlon; smooth fields approximately."""
    nlat, nlon, F = 73, 144, 24
    idx, w = g.latlon_to_cubed_sphere_indices(F, nlat, nlon)
    assert idx.shape == (6, F, F, 4) and w.shape == (6, F, F, 4)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)

    grid = g.LatLonGrid(nlat, nlon)
    lat2d = np.broadcast_to(grid.lat[:, None], (nlat, nlon))
    x = np.sin(np.deg2rad(lat2d)).astype(np.float32)
    cs_vals = (x.ravel()[idx] * w).sum(-1)

    idx2, w2 = g.cubed_sphere_to_latlon_indices(F, nlat, nlon)
    back = (cs_vals.ravel()[idx2] * w2).sum(-1)
    # interior agreement (poles are coarse on a small test grid)
    err = np.abs(back - x)[5:-5]
    assert err.mean() < 0.02


def test_icosahedral_multimesh():
    mesh = g.icosahedral_multimesh(2)
    # refinement k: V = 10*4^k + 2
    assert mesh["verts"].shape == (162, 3)
    np.testing.assert_allclose(np.linalg.norm(mesh["verts"], axis=-1), 1.0, atol=1e-12)
    # multimesh edges include all levels; finest level has 480 directed edges...
    edges = mesh["edges"]
    assert edges.shape[1] == 2
    # every edge bidirectional
    s = {(int(a), int(b)) for a, b in edges}
    assert all((b, a) in s for a, b in s)
    # finest-level faces reference only valid vertices
    assert mesh["faces"].max() < 162
