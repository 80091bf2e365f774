"""Static graph construction + TPU-friendly message passing.

GraphCast's irregular gather/scatter is the hard TPU case (SURVEY.md §7
hard part 3).  Everything dynamic is precomputed here as static numpy
index tables at setup:

- grid↔mesh bipartite edges (radius query / containing triangle)
- edge features in the receiver's local east-north frame
- edges sorted by destination, then packed into segment-aligned fixed
  blocks (``build_block_plan``) so aggregation and dst-side expansion
  run as batched one-hot matmuls on the MXU — TPU scatters and row
  gathers are latency-bound (~6-18 µs per 1k rows measured on v5e)

Message MLPs over the ~1.6M grid2mesh edges run in group-scanned block
batches to bound activation memory on a 16 GB chip.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from skyrim_tpu.grid import LatLonGrid, icosahedral_multimesh


def _latlon_to_xyz(lat_deg: np.ndarray, lon_deg: np.ndarray) -> np.ndarray:
    lat = np.deg2rad(lat_deg)
    lon = np.deg2rad(lon_deg)
    return np.stack(
        [np.cos(lat) * np.cos(lon), np.cos(lat) * np.sin(lon), np.sin(lat)], axis=-1
    )


def _local_frame(xyz: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(east, north) unit tangent vectors at each point (N, 3)."""
    z = np.array([0.0, 0.0, 1.0])
    east = np.cross(z, xyz)
    norm = np.linalg.norm(east, axis=-1, keepdims=True)
    # at the poles pick an arbitrary tangent
    east = np.where(norm > 1e-9, east / np.maximum(norm, 1e-9), np.array([1.0, 0, 0]))
    north = np.cross(xyz, east)
    north /= np.maximum(np.linalg.norm(north, axis=-1, keepdims=True), 1e-9)
    return east, north


def edge_features(src_xyz: np.ndarray, dst_xyz: np.ndarray) -> np.ndarray:
    """4 features per edge: [length, d·east_dst, d·north_dst, d·up_dst]."""
    d = src_xyz - dst_xyz
    length = np.linalg.norm(d, axis=-1, keepdims=True)
    east, north = _local_frame(dst_xyz)
    de = (d * east).sum(-1, keepdims=True)
    dn = (d * north).sum(-1, keepdims=True)
    du = (d * dst_xyz).sum(-1, keepdims=True)
    return np.concatenate([length, de, dn, du], axis=-1).astype(np.float32)


def node_features(lat_deg: np.ndarray, lon_deg: np.ndarray) -> np.ndarray:
    """3 static features: [sin(lat), cos(lon), sin(lon)] (GraphCast-style)."""
    lat = np.deg2rad(lat_deg)
    lon = np.deg2rad(lon_deg)
    return np.stack([np.sin(lat), np.cos(lon), np.sin(lon)], axis=-1).astype(np.float32)


def _sort_by_dst(src, dst, feat):
    order = np.argsort(dst, kind="stable")
    return src[order].astype(np.int32), dst[order].astype(np.int32), feat[order]


@lru_cache(maxsize=4)
def build_graphs(nlat: int, nlon: int, refinements: int, radius_factor: float = 0.6):
    """All static tables for GraphCast on (nlat, nlon) with an R-times
    refined icosahedral multimesh.

    Returns a dict of numpy arrays:
      mesh_src/mesh_dst/mesh_efeat       — multimesh edges (sorted by dst)
      g2m_src/g2m_dst/g2m_efeat          — grid→mesh (src: grid flat idx)
      m2g_src/m2g_dst/m2g_efeat          — mesh→grid (dst: grid flat idx)
      mesh_nfeat / grid_nfeat            — static node features
      n_mesh / n_grid
    """
    from scipy.spatial import cKDTree

    mesh = icosahedral_multimesh(refinements)
    mverts = mesh["verts"]  # (V, 3)
    mlatlon = mesh["latlon"]
    n_mesh = len(mverts)

    grid = LatLonGrid(nlat, nlon)
    glat = np.repeat(grid.lat, nlon)
    glon = np.tile(grid.lon, nlat)
    gxyz = _latlon_to_xyz(glat, glon)
    n_grid = nlat * nlon

    # --- multimesh edges ---
    ms, md = mesh["edges"][:, 0], mesh["edges"][:, 1]
    mef = edge_features(mverts[ms], mverts[md])
    ms, md, mef = _sort_by_dst(ms, md, mef)

    # --- grid→mesh: grid points within radius of each mesh node ---
    faces = mesh["faces"]
    finest_edge = np.linalg.norm(
        mverts[faces[:, 0]] - mverts[faces[:, 1]], axis=-1
    ).min()
    radius = radius_factor * np.linalg.norm(
        mverts[faces[:, 0]] - mverts[faces[:, 1]], axis=-1
    ).max()
    gtree = cKDTree(gxyz)
    pairs = gtree.query_ball_point(mverts, r=radius)
    g2m_src = np.concatenate([np.asarray(p, dtype=np.int64) for p in pairs])
    g2m_dst = np.concatenate(
        [np.full(len(p), i, dtype=np.int64) for i, p in enumerate(pairs)]
    )
    g2m_ef = edge_features(gxyz[g2m_src], mverts[g2m_dst])
    g2m_src, g2m_dst, g2m_ef = _sort_by_dst(g2m_src, g2m_dst, g2m_ef)

    # --- mesh→grid: 3 vertices of the containing finest triangle ---
    mtree = cKDTree(mverts)
    _, nearest_v = mtree.query(gxyz, k=1)
    # faces incident to each vertex
    incident: list[list[int]] = [[] for _ in range(n_mesh)]
    for fi, (a, b, c) in enumerate(faces):
        incident[a].append(fi)
        incident[b].append(fi)
        incident[c].append(fi)
    max_inc = max(len(x) for x in incident)
    inc_tbl = np.zeros((n_mesh, max_inc), dtype=np.int64)
    for v, fl in enumerate(incident):
        inc_tbl[v, : len(fl)] = fl
        inc_tbl[v, len(fl) :] = fl[0] if fl else 0
    cand = inc_tbl[nearest_v]  # (n_grid, max_inc)

    # barycentric coords wrt each candidate face (gnomonic projection)
    A = mverts[faces[cand, 0]]  # (n_grid, max_inc, 3)
    B = mverts[faces[cand, 1]]
    C = mverts[faces[cand, 2]]
    P = gxyz[:, None, :]

    def det3(u, v, w):
        return np.einsum("...i,...i->...", u, np.cross(v, w))

    wa = det3(P, B, C)
    wb = det3(A, P, C)
    wc = det3(A, B, P)
    tot = wa + wb + wc
    bary = np.stack([wa, wb, wc], axis=-1) / np.where(
        np.abs(tot)[..., None] > 1e-12, tot[..., None], 1.0
    )
    score = bary.min(axis=-1)  # (n_grid, max_inc): containing face ⇒ all ≥ 0
    best = score.argmax(axis=1)
    best_face = cand[np.arange(n_grid), best]
    tri = faces[best_face]  # (n_grid, 3)

    m2g_src = tri.reshape(-1)
    m2g_dst = np.repeat(np.arange(n_grid, dtype=np.int64), 3)
    m2g_ef = edge_features(mverts[m2g_src], gxyz[m2g_dst])
    # m2g_dst is already sorted, so the stable sort is the identity and
    # edges 3g..3g+2 stay exactly faces[m2g_face[g]] in vertex order —
    # the face-structured gather in models/graphcast.py relies on this
    m2g_src, m2g_dst, m2g_ef = _sort_by_dst(m2g_src, m2g_dst, m2g_ef)

    return {
        "mesh_src": ms, "mesh_dst": md, "mesh_efeat": mef,
        "g2m_src": g2m_src, "g2m_dst": g2m_dst, "g2m_efeat": g2m_ef,
        "m2g_src": m2g_src, "m2g_dst": m2g_dst, "m2g_efeat": m2g_ef,
        "m2g_face": best_face.astype(np.int32), "faces": faces.astype(np.int32),
        "mesh_nfeat": node_features(mlatlon[:, 0], mlatlon[:, 1]),
        "grid_nfeat": node_features(glat, glon),
        "n_mesh": n_mesh, "n_grid": n_grid,
        "finest_edge": float(finest_edge),
    }  # fmt: skip


def chunk_static(a: np.ndarray, n_chunks: int, fill=0, multiple: int = 1) -> np.ndarray:
    """Host-side pre-chunking of a static table into scan layout
    (n_chunks, chunk, ...).  Chunk size is rounded up to ``multiple``
    (fixed-degree aggregation needs chunk % degree == 0).  Doing this
    once at build time keeps multi-GB pad/reshape copies out of the
    per-step XLA program."""
    a = np.asarray(a)
    E = a.shape[0]
    chunk = -(-E // n_chunks)
    chunk = -(-chunk // multiple) * multiple
    pad = chunk * n_chunks - E
    widths = ((0, pad),) + ((0, 0),) * (a.ndim - 1)
    return np.pad(a, widths, constant_values=fill).reshape(
        n_chunks, chunk, *a.shape[1:]
    )


def build_block_plan(
    seg_sorted: np.ndarray,
    n_seg: int,
    target_rows: int = 2048,
    row_multiple: int = 8,
    seg_multiple: int = 8,
    block_multiple: int = 1,
) -> dict:
    """Segment-aligned block partition of a dst-sorted edge list.

    TPU scatters (segment_sum) and row gathers are latency-bound
    (~6-18 µs per 1k rows measured on v5e); packing whole segments into
    fixed-size row blocks turns both the aggregation AND the dst-side
    expansion into batched one-hot matmuls on the MXU.

    Greedily packs consecutive segments into blocks of ≤ ``target_rows``
    rows (a segment larger than target_rows gets its own block and M
    grows to fit it).  Returns numpy tables:

      starts   (B,)      first edge row of each block
      seg_lo   (B,)      first segment id of each block
      local    (B, M)    per-row local segment index (SB ⇒ padding row)
      M, SB              padded rows / segments per block
      n_seg, E           original sizes
    """
    seg = np.asarray(seg_sorted)
    E = len(seg)
    # first row of every segment (segments may be empty)
    seg_start = np.searchsorted(seg, np.arange(n_seg + 1), side="left")
    blocks = []  # (row_start, seg_lo, n_segs)
    s = 0
    while s < n_seg:
        row0 = seg_start[s]
        e = s + 1
        while e < n_seg and seg_start[e + 1] - row0 <= target_rows:
            e += 1
        blocks.append((row0, s, e - s))
        s = e
    while len(blocks) % block_multiple:  # empty tail blocks for even group
        blocks.append((E, n_seg, 0))     # splits (scan over block groups)
    B = len(blocks)
    M = max(
        (seg_start[s + n] - r0 for r0, s, n in blocks), default=1
    )
    M = max(-(-M // row_multiple) * row_multiple, row_multiple)
    SB = max(n for _, _, n in blocks)
    SB = max(-(-SB // seg_multiple) * seg_multiple, seg_multiple)
    starts = np.array([r0 for r0, _, _ in blocks], np.int32)
    seg_lo = np.array([s for _, s, _ in blocks], np.int32)
    local = np.full((B, M), SB, np.int32)  # SB = padding sentinel
    for b, (r0, s, n) in enumerate(blocks):
        rows = seg_start[s + n] - r0
        local[b, :rows] = seg[r0 : r0 + rows] - s
    # flat (n_seg,) index into (B·SB) block-local aggregates — one static
    # gather re-assembles instead of a B-piece concat
    block_of_seg = np.repeat(np.arange(B), [n for _, _, n in blocks])
    segs = np.arange(n_seg)
    unpack = (block_of_seg * SB + segs - seg_lo[block_of_seg]).astype(np.int32)
    return {
        "starts": starts, "seg_lo": seg_lo, "local": local, "unpack": unpack,
        "M": int(M), "SB": int(SB), "n_seg": int(n_seg), "E": int(E),
    }  # fmt: skip


def pad_rows_to_blocks(a: np.ndarray, plan: dict) -> np.ndarray:
    """Re-lay a dst-sorted per-edge table into the plan's padded
    (B, M, ...) block layout (host-side, for static tables)."""
    starts, M = plan["starts"], plan["M"]
    B = len(starts)
    out = np.zeros((B, M, *a.shape[1:]), a.dtype)
    E = plan["E"]
    for b in range(B):
        r0 = int(starts[b])
        r1 = int(starts[b + 1]) if b + 1 < B else E
        out[b, : r1 - r0] = a[r0:r1]
    return out


def build_face_tiles(face_hw: np.ndarray, th: int, tw: int) -> dict:
    """Per-(th, tw)-tile unique-face tables for the mesh→grid decoder.

    A flat row-gather of the wide face latents moves ~3.2 GB/step at
    gather (row-latency) rates — 28.5 ms measured on v5e.  Spatial
    (th, tw) grid tiles touch few distinct faces (8×128 ⇒ ≤189 at
    0.25°/refinement-6), so the kernel can instead load each tile's
    unique face rows (~0.6 GB total) and expand them per point with a
    one-hot matmul on the MXU.

    Returns:
      tile_faces (TH, TW, U) int32 — face ids per tile (padded by
        repeating the tile's first id; harmless duplicate rows)
      tile_local (H, W) int32 — each point's index into its tile's row
      U, th, tw
    """
    face_hw = np.asarray(face_hw)
    H, W = face_hw.shape
    TH, TW = -(-H // th), -(-W // tw)
    uniqs = []
    local = np.zeros((H, W), np.int32)
    for i in range(TH):
        for j in range(TW):
            tile = face_hw[i * th : (i + 1) * th, j * tw : (j + 1) * tw]
            u, inv = np.unique(tile, return_inverse=True)
            uniqs.append(u)
            local[i * th : (i + 1) * th, j * tw : (j + 1) * tw] = inv.reshape(
                tile.shape
            )
    U = max(len(u) for u in uniqs)
    U = max(-(-U // 8) * 8, 8)
    tile_faces = np.zeros((TH, TW, U), np.int32)
    k = 0
    for i in range(TH):
        for j in range(TW):
            u = uniqs[k]
            k += 1
            tile_faces[i, j, : len(u)] = u
            tile_faces[i, j, len(u) :] = u[0]
    return {"tile_faces": tile_faces, "tile_local": local,
            "U": int(U), "th": int(th), "tw": int(tw)}  # fmt: skip


def pick_exact_tile(n: int, max_t: int, mult: int = 1) -> int:
    """Largest divisor of ``n`` ≤ ``max_t``, preferring multiples of
    ``mult`` (TPU sublane alignment).  Exact division matters when
    out-of-bounds tile rows would poison an in-bounds aggregation
    (grid-major g2m: garbage ``local`` ids can hit live one-hot
    columns), so tiles must cover the array exactly."""
    divs = [d for d in range(1, min(n, max_t) + 1) if n % d == 0]
    pref = [d for d in divs if d % mult == 0]
    return max(pref or divs)


def build_g2m_tiles(
    src: np.ndarray,
    dst: np.ndarray,
    efeat: np.ndarray,
    H: int,
    W: int,
    n_seg: int,
) -> dict:
    """Grid-major slot tables for the grid→mesh encoder.

    The dst-sorted block plan needs a 1.7 GB per-edge gather of the
    source latents (23.7 ms at v5e gather rates, round 5).  Flipped to
    grid-major, the source side is CONTIGUOUS (each grid point's latent
    row, out-degree ≤ 3 at 0.25°), and a (th, tw) spatial tile sends to
    ≤125 distinct mesh nodes — so aggregation is a per-tile one-hot
    matmul, with a small static re-gather combining tile partials into
    the mesh nodes (a node's disc spans ~1.7 tiles).

    Returns:
      D, U                      — max out-degree / padded unique dsts per tile
      slot_ef   (H, W, D, 4)    — per-slot edge features (0 for empty)
      slot_dst  (H, W, D) int32 — per-slot mesh dst id (0 for empty)
      local     (TH, TW, D, th·tw) int32 — slot's index into its tile's
                                  unique table; == U ⇒ empty slot (never
                                  aggregates).  Tile-flat layout so the
                                  kernel block's last two dims (D, R)
                                  equal the array dims (Mosaic rule)
      combine_idx (Mc,) int32   — flat (tile·U + u) positions, dst-sorted
      combine_seg (Mc,) int32   — their mesh ids (sorted)
    """
    src = np.asarray(src)
    dst = np.asarray(dst)
    E = len(src)
    n_grid = H * W
    order = np.argsort(src, kind="stable")
    s_s, d_s, ef_s = src[order], dst[order], np.asarray(efeat)[order]
    counts = np.bincount(s_s, minlength=n_grid)
    D = int(counts.max())
    starts = np.zeros(n_grid + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    k = np.arange(E) - starts[s_s]
    slot_dst = np.zeros((n_grid, D), np.int32)
    slot_ef = np.zeros((n_grid, D, efeat.shape[-1]), np.float32)
    valid = np.zeros((n_grid, D), bool)
    slot_dst[s_s, k] = d_s
    slot_ef[s_s, k] = ef_s
    valid[s_s, k] = True

    th = pick_exact_tile(H, 16)
    tw = pick_exact_tile(W, 192, mult=16)
    TH, TW = H // th, W // tw
    sd_hw = slot_dst.reshape(H, W, D)
    va_hw = valid.reshape(H, W, D)
    local = np.zeros((H, W, D), np.int32)
    uniqs = []
    for i in range(TH):
        for j in range(TW):
            sl = (slice(i * th, (i + 1) * th), slice(j * tw, (j + 1) * tw))
            tile_d, tile_v = sd_hw[sl], va_hw[sl]
            u, inv = np.unique(tile_d[tile_v], return_inverse=True)
            loc = np.zeros(tile_d.shape, np.int32)
            loc[tile_v] = inv
            uniqs.append(u)
            local[sl] = loc
    U = max((len(u) for u in uniqs), default=1)
    U = max(-(-U // 8) * 8, 8)
    # empty slots point past the unique table (== U sentinel)
    local[~va_hw] = U
    combine_idx, combine_seg = [], []
    t = 0
    for i in range(TH):
        for j in range(TW):
            u = uniqs[t]
            combine_idx.extend(t * U + np.arange(len(u)))
            combine_seg.extend(u)
            t += 1
    combine_idx = np.asarray(combine_idx, np.int32)
    combine_seg = np.asarray(combine_seg, np.int32)
    so = np.argsort(combine_seg, kind="stable")
    local_t = np.ascontiguousarray(
        local.reshape(TH, th, TW, tw, D)
        .transpose(0, 2, 4, 1, 3)
        .reshape(TH, TW, D, th * tw)
    )
    return {
        "D": D, "U": int(U),
        "slot_ef": slot_ef.reshape(H, W, D, -1),
        "slot_dst": sd_hw,
        "local": local_t,
        "combine_idx": combine_idx[so],
        "combine_seg": combine_seg[so],
        "th": int(th), "tw": int(tw),
    }  # fmt: skip


def block_onehot(plan: dict, dtype=jnp.bfloat16) -> jax.Array:
    """(B, SB, M) one-hot aggregation operator from the plan's local
    segment ids; padding rows (local == SB) hit no segment."""
    local = jnp.asarray(plan["local"])  # (B, M)
    iota = jnp.arange(plan["SB"], dtype=local.dtype)
    return (local[:, None, :] == iota[None, :, None]).astype(dtype)


def block_segment_sum(data_blocks: jax.Array, plan: dict, onehot=None) -> jax.Array:
    """Aggregate padded (B, M, D) rows into (n_seg, D) via batched
    one-hot matmuls (MXU) instead of a scatter."""
    oh = block_onehot(plan, data_blocks.dtype) if onehot is None else onehot
    # no explicit f32 accumulation request: the TPU MXU accumulates in
    # f32 natively for bf16 inputs, and XLA:CPU cannot lower a mixed
    # BF16xBF16=F32 dot under autodiff
    agg = jnp.einsum("bsm,bmd->bsd", oh, data_blocks)
    # blocks hold disjoint consecutive segment ranges → one static gather
    return agg.reshape(-1, agg.shape[-1])[jnp.asarray(plan["unpack"])]


def block_expand_dst(seg_vals: jax.Array, plan: dict, onehot=None) -> jax.Array:
    """Expand per-segment rows (n_seg, D) to padded per-edge block layout
    (B, M, D) — the dst-side 'gather' as a batched matmul.  Uses a small
    (B·SB)-row gather to stage each block's segment range."""
    SB = plan["SB"]
    seg_lo = jnp.asarray(plan["seg_lo"])  # (B,)
    idx = jnp.clip(seg_lo[:, None] + jnp.arange(SB)[None, :], 0, plan["n_seg"] - 1)
    staged = seg_vals[idx]  # (B, SB, D)
    oh = block_onehot(plan, seg_vals.dtype) if onehot is None else onehot
    return jnp.einsum("bsm,bsd->bmd", oh, staged)

