"""Distance / angle measurement tools.

Parity with the dashboard's measurement surface (ref: app.py:1024-1162):
point-to-point distance in mm and three-point angle in degrees, plus
nearest-vertex snapping onto a mesh.
"""

from __future__ import annotations

import numpy as np

from omfs4d.ops.mesh import TriMesh


def snap_to_mesh(mesh: TriMesh, point) -> np.ndarray:
    """Nearest mesh vertex to a picked point."""
    p = np.asarray(point, dtype=np.float64)
    d = np.linalg.norm(mesh.vertices.astype(np.float64) - p[None, :], axis=1)
    return mesh.vertices[int(np.argmin(d))].astype(np.float64)


def distance_mm(p1, p2) -> float:
    """Euclidean distance between two points (mesh units are mm)."""
    return float(np.linalg.norm(np.asarray(p1, float) - np.asarray(p2, float)))


def angle_deg(p1, vertex, p2) -> float:
    """Angle at `vertex` formed by rays to p1 and p2, in degrees."""
    v1 = np.asarray(p1, float) - np.asarray(vertex, float)
    v2 = np.asarray(p2, float) - np.asarray(vertex, float)
    n1, n2 = np.linalg.norm(v1), np.linalg.norm(v2)
    if n1 < 1e-12 or n2 < 1e-12:
        raise ValueError("measurement points must be distinct from the vertex")
    cosang = np.clip(np.dot(v1, v2) / (n1 * n2), -1.0, 1.0)
    return float(np.degrees(np.arccos(cosang)))
