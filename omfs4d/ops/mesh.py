"""First-party triangle-mesh container and geometry ops.

Replaces the reference's VTK/PyVista dependency (ref: surgical_sim.py uses
`mesh.clip`, dicom_loader.py uses `.clean().smooth().decimate()`):

  * ``TriMesh``      — host container (vertices, faces) with PyVista-like API
  * ``plane_clip``   — half-space clip with exact triangle splitting at the
                       plane (same contract as VTK clip)
  * ``laplacian_smooth`` — fixed-degree-padded neighbor averaging; jit-able
  * ``decimate_cluster`` — grid vertex-clustering decimation

Conventions match the reference: `center` is the bounding-box center and
`clip(normal, origin, invert=False)` keeps the side with
(p - origin) . normal > 0 (ref comment: surgical_sim.py:180-184).
"""

from __future__ import annotations

import numpy as np


class TriMesh:
    """Host-side indexed triangle mesh."""

    def __init__(self, vertices=None, faces=None):
        self.vertices = (
            np.zeros((0, 3), np.float32)
            if vertices is None
            else np.asarray(vertices, dtype=np.float32).reshape(-1, 3)
        )
        self.faces = (
            np.zeros((0, 3), np.int32)
            if faces is None
            else np.asarray(faces, dtype=np.int32).reshape(-1, 3)
        )

    # ── basic properties ─────────────────────────────────────
    @property
    def n_points(self) -> int:
        return len(self.vertices)

    @property
    def n_faces(self) -> int:
        return len(self.faces)

    @property
    def bounds(self):
        """(xmin, xmax, ymin, ymax, zmin, zmax) — VTK layout."""
        if self.n_points == 0:
            return (0.0,) * 6
        mn = self.vertices.min(axis=0)
        mx = self.vertices.max(axis=0)
        return (mn[0], mx[0], mn[1], mx[1], mn[2], mx[2])

    @property
    def center(self):
        """Bounding-box center (PyVista convention)."""
        b = self.bounds
        return np.array([(b[0] + b[1]) / 2, (b[2] + b[3]) / 2, (b[4] + b[5]) / 2])

    def copy(self) -> "TriMesh":
        return TriMesh(self.vertices.copy(), self.faces.copy())

    # ── transforms ───────────────────────────────────────────
    def translate(self, vec, inplace: bool = False) -> "TriMesh":
        m = self if inplace else self.copy()
        m.vertices = m.vertices + np.asarray(vec, dtype=np.float32)[None, :]
        return m

    def _rotate(self, R: np.ndarray, point, inplace: bool) -> "TriMesh":
        m = self if inplace else self.copy()
        p = np.zeros(3) if point is None else np.asarray(point, dtype=np.float64)
        m.vertices = ((m.vertices - p) @ R.T + p).astype(np.float32)
        return m

    def rotate_x(self, deg: float, point=None, inplace: bool = False) -> "TriMesh":
        a = np.radians(deg)
        R = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
        return self._rotate(R, point, inplace)

    def rotate_y(self, deg: float, point=None, inplace: bool = False) -> "TriMesh":
        a = np.radians(deg)
        R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])
        return self._rotate(R, point, inplace)

    def rotate_z(self, deg: float, point=None, inplace: bool = False) -> "TriMesh":
        a = np.radians(deg)
        R = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
        return self._rotate(R, point, inplace)

    # ── topology ops ─────────────────────────────────────────
    def merge(self, other: "TriMesh") -> "TriMesh":
        if other is None or other.n_points == 0:
            return self.copy()
        if self.n_points == 0:
            return other.copy()
        verts = np.concatenate([self.vertices, other.vertices])
        faces = np.concatenate([self.faces, other.faces + self.n_points])
        return TriMesh(verts, faces)

    def clean(self, tol: float = 0.0) -> "TriMesh":
        """Merge coincident vertices, drop unused vertices + degenerate faces."""
        if self.n_points == 0:
            return self.copy()
        v = self.vertices
        key = v if tol <= 0 else np.round(v / tol) * tol
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        # representative positions: first occurrence
        first = np.full(len(uniq), -1, dtype=np.int64)
        order = np.arange(len(v))[::-1]
        first[inv[order]] = order
        new_v = v[first]
        new_f = inv[self.faces]
        ok = (
            (new_f[:, 0] != new_f[:, 1])
            & (new_f[:, 1] != new_f[:, 2])
            & (new_f[:, 0] != new_f[:, 2])
        )
        new_f = new_f[ok]
        if len(new_f):
            # dedup faces by unordered vertex set (keep first winding)
            sorted_f = np.sort(new_f, axis=1)
            _, first_idx = np.unique(sorted_f, axis=0, return_index=True)
            new_f = new_f[np.sort(first_idx)]
        # drop unused vertices
        used = np.zeros(len(new_v), dtype=bool)
        used[new_f] = True
        remap = np.cumsum(used) - 1
        return TriMesh(new_v[used], remap[new_f].astype(np.int32))

    def clip(self, normal, origin, invert: bool = False) -> "TriMesh":
        n = np.asarray(normal, dtype=np.float64)
        if invert:
            n = -n
        return plane_clip(self, n, np.asarray(origin, dtype=np.float64))

    def smooth(self, n_iter: int = 20, relaxation_factor: float = 0.01) -> "TriMesh":
        return laplacian_smooth(self, n_iter, relaxation_factor)

    def decimate(self, target_reduction: float) -> "TriMesh":
        return decimate_cluster(self, target_reduction)

    def connectivity_components(self):
        """Label connected components; returns (labels_per_vertex, count)."""
        n = self.n_points
        parent = np.arange(n)

        def find(a):
            root = a
            while parent[root] != root:
                root = parent[root]
            while parent[a] != root:
                parent[a], a = root, parent[a]
            return root

        for f in self.faces:
            ra, rb, rc = find(f[0]), find(f[1]), find(f[2])
            parent[rb] = ra
            parent[find(rc)] = find(ra)
        roots = np.array([find(i) for i in range(n)])
        uniq, labels = np.unique(roots, return_inverse=True)
        return labels, len(uniq)


# ── plane clip with triangle splitting ─────────────────────


def plane_clip(mesh: TriMesh, normal, origin) -> TriMesh:
    """Keep the half-space (p - origin) . normal > 0, splitting straddling
    triangles exactly at the plane (VTK-clip parity).  Vectorized numpy."""
    if mesh.n_points == 0 or mesh.n_faces == 0:
        return TriMesh()
    n = np.asarray(normal, dtype=np.float64)
    n = n / max(np.linalg.norm(n), 1e-300)
    d = (mesh.vertices.astype(np.float64) - np.asarray(origin)[None, :]) @ n

    fd = d[mesh.faces]                          # (M, 3) signed distances
    keep_v = fd >= 0.0
    n_keep = keep_v.sum(axis=1)

    tris_in = mesh.faces[n_keep == 3]

    out_verts = [mesh.vertices]
    out_faces = [tris_in]
    base = mesh.n_points

    def _intersect(pa, pb, da, db):
        t = da / (da - db)
        return mesh.vertices[pa] + t[:, None].astype(np.float32) * (
            mesh.vertices[pb] - mesh.vertices[pa]
        )

    # Case: exactly 1 vertex kept -> 1 smaller triangle.
    one = np.flatnonzero(n_keep == 1)
    if one.size:
        f = mesh.faces[one]
        kf = keep_v[one]
        # rotate each triangle so the kept vertex is slot 0
        k_idx = np.argmax(kf, axis=1)
        rot = (np.arange(3)[None, :] + k_idx[:, None]) % 3
        f = np.take_along_axis(f, rot, axis=1)
        da, db, dc = d[f[:, 0]], d[f[:, 1]], d[f[:, 2]]
        pab = _intersect(f[:, 0], f[:, 1], da, db)
        pac = _intersect(f[:, 0], f[:, 2], da, dc)
        m = len(f)
        ia = base + np.arange(m)
        ic = base + m + np.arange(m)
        out_verts += [pab, pac]
        out_faces.append(np.stack([f[:, 0], ia, ic], axis=1))
        base += 2 * m

    # Case: exactly 2 vertices kept -> quad -> 2 triangles.
    two = np.flatnonzero(n_keep == 2)
    if two.size:
        f = mesh.faces[two]
        kf = keep_v[two]
        # rotate so the DROPPED vertex is slot 0
        drop_idx = np.argmin(kf, axis=1)
        rot = (np.arange(3)[None, :] + drop_idx[:, None]) % 3
        f = np.take_along_axis(f, rot, axis=1)
        da, db, dc = d[f[:, 0]], d[f[:, 1]], d[f[:, 2]]
        pab = _intersect(f[:, 0], f[:, 1], da, db)   # on edge drop->kept1
        pac = _intersect(f[:, 0], f[:, 2], da, dc)   # on edge drop->kept2
        m = len(f)
        iab = base + np.arange(m)
        iac = base + m + np.arange(m)
        out_verts += [pab, pac]
        out_faces.append(np.stack([iab, f[:, 1], f[:, 2]], axis=1))
        out_faces.append(np.stack([iab, f[:, 2], iac], axis=1))
        base += 2 * m

    verts = np.concatenate(out_verts).astype(np.float32)
    faces = np.concatenate([np.asarray(x, dtype=np.int64) for x in out_faces]) if out_faces else np.zeros((0, 3), np.int64)
    return TriMesh(verts, faces.astype(np.int32)).clean()


# ── Laplacian smoothing ────────────────────────────────────


def vertex_adjacency(faces: np.ndarray, n_verts: int, max_degree: int = 0):
    """Fixed-width padded adjacency (neighbor ids, validity mask).

    Padding to the max vertex degree gives static shapes so the smoothing
    iteration can run as one jitted gather+mean on device.
    """
    edges = np.concatenate([
        faces[:, [0, 1]], faces[:, [1, 0]],
        faces[:, [1, 2]], faces[:, [2, 1]],
        faces[:, [2, 0]], faces[:, [0, 2]],
    ])
    edges = np.unique(edges, axis=0)
    src, dst = edges[:, 0], edges[:, 1]
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    counts = np.bincount(src, minlength=n_verts)
    deg = int(counts.max()) if len(counts) else 0
    if max_degree:
        deg = min(deg, max_degree)
    nbr = np.zeros((n_verts, max(deg, 1)), dtype=np.int64)
    mask = np.zeros((n_verts, max(deg, 1)), dtype=bool)
    offsets = np.zeros(n_verts + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    for v in range(n_verts):
        k = min(counts[v], deg)
        nbr[v, :k] = dst[offsets[v]: offsets[v] + k]
        mask[v, :k] = True
    return nbr, mask


def laplacian_smooth(mesh: TriMesh, n_iter: int = 20, relaxation_factor: float = 0.01) -> TriMesh:
    """Classic Laplacian smoothing: v += lambda * (mean(neighbors) - v).

    Defaults mirror PyVista's `smooth` (relaxation_factor=0.01), which the
    reference calls with n_iter=30 (ref: dicom_loader.py:157-158).
    Dispatches to the native meshkit kernel when built.
    """
    if mesh.n_points == 0 or n_iter <= 0:
        return mesh.copy()
    nbr, mask = vertex_adjacency(mesh.faces, mesh.n_points)

    from omfs4d import native
    nv = native.laplacian_smooth_native(mesh.vertices, nbr, mask,
                                        n_iter, relaxation_factor)
    if nv is not None:
        return TriMesh(nv, mesh.faces.copy())

    v = mesh.vertices.astype(np.float64)
    denom = np.maximum(mask.sum(axis=1, keepdims=True), 1)
    has_nbr = mask.any(axis=1, keepdims=True)
    for _ in range(n_iter):
        neigh = v[nbr] * mask[..., None]
        mean = neigh.sum(axis=1) / denom
        v = np.where(has_nbr, v + relaxation_factor * (mean - v), v)
    return TriMesh(v.astype(np.float32), mesh.faces.copy())


# ── decimation (grid vertex clustering) ────────────────────


def decimate_cluster(mesh: TriMesh, target_reduction: float) -> TriMesh:
    """Vertex-clustering decimation to ~(1 - target_reduction) of the faces.

    Host-side preprocessing (meshes only get decimated once per ingest,
    ref: dicom_loader.py:161-163).  Uses the native QEM edge-collapse
    decimator (omfs4d/native) when built, else grid clustering.
    """
    if mesh.n_faces == 0 or not (0.0 < target_reduction < 1.0):
        return mesh.copy()
    keep_frac = 1.0 - target_reduction
    target_faces = max(int(mesh.n_faces * keep_frac), 4)

    from omfs4d import native
    out = native.qem_decimate_native(mesh.vertices, mesh.faces, target_faces)
    if out is not None:
        return TriMesh(out[0], out[1]).clean()

    v = mesh.vertices
    lo = v.min(axis=0)
    extent = np.maximum(v.max(axis=0) - lo, 1e-9)

    # Binary-search the grid resolution that lands near the face target.
    lo_res, hi_res = 2, 512
    best = None
    for _ in range(12):
        res = (lo_res + hi_res) // 2
        m = _cluster_at(mesh, lo, extent, res)
        if best is None or abs(m.n_faces - target_faces) < abs(best.n_faces - target_faces):
            best = m
        if m.n_faces > target_faces:
            hi_res = max(res - 1, 2)
        else:
            lo_res = min(res + 1, 512)
        if lo_res >= hi_res:
            break
    return best


def _cluster_at(mesh: TriMesh, lo, extent, res: int) -> TriMesh:
    cell = np.floor((mesh.vertices - lo) / extent * (res - 1e-6)).astype(np.int64)
    key = (cell[:, 0] * res + cell[:, 1]) * res + cell[:, 2]
    uniq, inv = np.unique(key, return_inverse=True)
    # cluster representative = mean position
    sums = np.zeros((len(uniq), 3), dtype=np.float64)
    np.add.at(sums, inv, mesh.vertices.astype(np.float64))
    counts = np.bincount(inv, minlength=len(uniq)).astype(np.float64)
    new_v = (sums / counts[:, None]).astype(np.float32)
    new_f = inv[mesh.faces]
    ok = (
        (new_f[:, 0] != new_f[:, 1])
        & (new_f[:, 1] != new_f[:, 2])
        & (new_f[:, 0] != new_f[:, 2])
    )
    new_f = new_f[ok]
    if len(new_f):
        # dedup by unordered vertex set, keeping first occurrence's winding
        sorted_f = np.sort(new_f, axis=1)
        _, first_idx = np.unique(sorted_f, axis=0, return_index=True)
        new_f = new_f[np.sort(first_idx)]
    return TriMesh(new_v, new_f.astype(np.int32)).clean()
