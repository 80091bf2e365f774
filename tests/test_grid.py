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


def test_inverse_gnomonic_recovers_cell_centers():
    """Every CS cell center must invert to its own (face, row, col)."""
    F = 16
    cs = g.CubedSphereGrid(F)
    lat, lon = cs.latlon
    lat_r, lon_r = np.deg2rad(lat.ravel()), np.deg2rad(lon.ravel())
    q = np.stack(
        [np.cos(lat_r) * np.cos(lon_r), np.cos(lat_r) * np.sin(lon_r), np.sin(lat_r)],
        axis=-1,
    )
    face, a, b = g._inverse_gnomonic(q)
    np.testing.assert_array_equal(
        face, np.repeat(np.arange(6), F * F), err_msg="face assignment"
    )
    fa = a / (np.pi / 2) * F + F / 2 - 0.5
    fb = b / (np.pi / 2) * F + F / 2 - 0.5
    cols = np.tile(np.tile(np.arange(F), F), 6)
    rows = np.tile(np.repeat(np.arange(F), F), 6)
    np.testing.assert_allclose(fa, cols, atol=1e-9)
    np.testing.assert_allclose(fb, rows, atol=1e-9)


def _emulate_patch_gather(table, starts, w, D):
    """Numpy emulation of the (2, 2·D) patch gather + bilinear combine."""
    out = np.zeros((len(starts), D), np.float64)
    for m, (r, c) in enumerate(starts):
        p = table[r : r + 2, c * D : (c + 2) * D]  # (2, 2D)
        out[m] = (
            w[m, 0] * p[0, :D] + w[m, 1] * p[0, D:]
            + w[m, 2] * p[1, :D] + w[m, 3] * p[1, D:]
        )
    return out


def test_patch_remap_roundtrip_beats_idw():
    """The bilinear patch tables must round-trip a smooth field at least
    as well as the 4-NN inverse-distance tables they replace."""
    nlat, nlon, F = 73, 144, 24
    grid = g.LatLonGrid(nlat, nlon)
    lat2d = np.broadcast_to(grid.lat[:, None], (nlat, nlon))
    lon2d = np.broadcast_to(grid.lon[None, :], (nlat, nlon))
    x = (np.sin(np.deg2rad(lat2d)) * np.cos(np.deg2rad(lon2d))).astype(np.float64)

    # latlon → CS via the patch tables (lon wrap-padded table, D=1)
    s_cs, w_cs = g.latlon_to_cubed_sphere_patch(F, nlat, nlon)
    assert s_cs.shape == (6 * F * F, 2) and w_cs.shape == (6 * F * F, 4)
    np.testing.assert_allclose(w_cs.sum(-1), 1.0, atol=1e-6)
    tab = np.concatenate([x, x[:, :1]], axis=1)  # (nlat, nlon+1)
    cs_vals = _emulate_patch_gather(tab, s_cs, w_cs, 1).reshape(6, F, F)

    # CS → latlon via halo-padded patch tables
    s_ll, w_ll = g.cubed_sphere_to_latlon_patch(F, nlat, nlon)
    np.testing.assert_allclose(w_ll.sum(-1), 1.0, atol=1e-6)
    halo = g.cubed_sphere_halo_indices(F, 1)  # (6, F+2, F+2)
    padded = cs_vals.reshape(-1)[halo.reshape(-1)].reshape(6 * (F + 2), F + 2)
    back = _emulate_patch_gather(padded, s_ll, w_ll, 1).reshape(nlat, nlon)

    err_new = np.abs(back - x)[5:-5].mean()

    # old 4-NN IDW pipeline for comparison
    idx, w = g.latlon_to_cubed_sphere_indices(F, nlat, nlon)
    cs_old = (x.ravel()[idx] * w).sum(-1)
    idx2, w2 = g.cubed_sphere_to_latlon_indices(F, nlat, nlon)
    back_old = (cs_old.ravel()[idx2] * w2).sum(-1)
    err_old = np.abs(back_old - x)[5:-5].mean()

    assert err_new < 0.02
    assert err_new <= err_old * 1.05, (err_new, err_old)


def test_patch_table_bounds():
    """Gather starts must admit a (2, 2·D) in-bounds slice (the model
    gathers with PROMISE_IN_BOUNDS — out-of-bounds would be UB)."""
    nlat, nlon, F = 73, 144, 16
    s_cs, _ = g.latlon_to_cubed_sphere_patch(F, nlat, nlon)
    assert s_cs[:, 0].min() >= 0 and s_cs[:, 0].max() <= nlat - 2
    assert s_cs[:, 1].min() >= 0 and s_cs[:, 1].max() <= nlon - 1
    s_ll, _ = g.cubed_sphere_to_latlon_patch(F, nlat, nlon)
    rows, cols = s_ll[:, 0], s_ll[:, 1]
    # row within its own face band: face·(F+2) + [0, F]
    assert rows.min() >= 0 and rows.max() <= 6 * (F + 2) - 2
    assert np.all((rows % (F + 2)) <= F)
    assert cols.min() >= 0 and cols.max() <= F
