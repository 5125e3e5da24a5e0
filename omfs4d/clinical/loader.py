"""CT/CBCT ingest: DICOM / NIfTI -> Hounsfield volume -> bone surface mesh.

Re-implements the reference's clinical ingest surface
(ref: 01_Clinical_Engine/dicom_loader.py:34-397) on the first-party stack:
omfs4d.io.dicom / omfs4d.io.nifti readers, marching-tetrahedra isosurface,
Laplacian smoothing and clustering decimation — no pydicom / nibabel /
skimage / VTK.

Coordinate conventions preserved:
  * marching output is (z, y, x)-scaled; vertices are reordered to (x, y, z)
    (ref: dicom_loader.py:148-151)
  * NIfTI masks go through the voxel->world RAS affine
    (ref: dicom_loader.py:237-243)
  * separate-mesh extraction centers all meshes at the combined center and
    flips Z so Superior is +Z (ref: dicom_loader.py:296-305)
"""

from __future__ import annotations

import numpy as np

from omfs4d.io.dicom import load_dicom_series
from omfs4d.io.nifti import load_nifti
from omfs4d.ops.marching import marching_cubes
from omfs4d.ops.mesh import TriMesh

# ToothFairy3 label mapping (ref: dicom_loader.py:176-194)
TOOTHFAIRY_LABELS = {
    "Lower Jawbone": 1,
    "Upper Jawbone": 2,
    "Left Inferior Alveolar Canal": 3,
    "Right Inferior Alveolar Canal": 4,
    "Left Maxillary Sinus": 5,
    "Right Maxillary Sinus": 6,
}
UPPER_TEETH_LABELS = [
    11, 12, 13, 14, 15, 16, 17, 18,
    21, 22, 23, 24, 25, 26, 27, 28,
]
LOWER_TEETH_LABELS = [
    31, 32, 33, 34, 35, 36, 37, 38,
    41, 42, 43, 44, 45, 46, 47, 48,
]
ALL_TEETH_LABELS = UPPER_TEETH_LABELS + LOWER_TEETH_LABELS


def load_dicom_volume(dicom_path: str):
    """DICOM folder -> ((Z, Y, X) HU volume, (z, y, x) spacing)."""
    return load_dicom_series(dicom_path)


def _postprocess(mesh: TriMesh, smooth_iterations: int, decimate_fraction: float) -> TriMesh:
    mesh = mesh.clean()
    if smooth_iterations > 0:
        mesh = mesh.smooth(n_iter=smooth_iterations)
    if 0.0 < decimate_fraction < 1.0:
        mesh = mesh.decimate(1.0 - decimate_fraction)
    return mesh


def dicom_to_bone_mesh(
    dicom_path: str,
    hu_threshold: float = 300.0,
    smooth_iterations: int = 30,
    decimate_fraction: float = 0.5,
) -> TriMesh:
    """DICOM series -> centered bone surface mesh (HU-threshold pipeline)."""
    volume, spacing = load_dicom_volume(dicom_path)
    verts, faces = marching_cubes(volume, level=hu_threshold, spacing=spacing)
    # (z, y, x) -> (x, y, z)
    verts_xyz = verts[:, ::-1].copy()
    mesh = _postprocess(TriMesh(verts_xyz, faces), smooth_iterations, decimate_fraction)
    if mesh.n_points:
        mesh.translate(-mesh.center, inplace=True)
    return mesh


def nifti_to_volume(nifti_path: str):
    """NIfTI -> (volume (i, j, k), spacing, 4x4 voxel->RAS affine)."""
    return load_nifti(nifti_path)


def _volume_mask_to_mesh(
    mask: np.ndarray,
    spacing: tuple,
    affine: np.ndarray,
    smooth_iterations: int = 30,
    decimate_fraction: float = 0.5,
) -> TriMesh:
    """Binary mask -> world-space (RAS) surface mesh."""
    if mask.sum() == 0:
        return TriMesh()
    verts, faces = marching_cubes(mask.astype(np.float32), level=0.5, spacing=(1.0, 1.0, 1.0))
    # marching works on the (i, j, k) grid directly (unit spacing); verts are
    # voxel indices in (i, j, k) order here because we feed the volume as-is.
    ones = np.ones((verts.shape[0], 1), dtype=np.float64)
    verts_world = (np.hstack([verts.astype(np.float64), ones]) @ affine.T)[:, :3]
    mesh = TriMesh(verts_world.astype(np.float32), faces)
    return _postprocess(mesh, smooth_iterations, decimate_fraction)


def nifti_label_to_separate_meshes(
    label_path: str,
    include_upper_labels=None,
    include_lower_labels=None,
    smooth_iterations: int = 30,
    decimate_fraction: float = 0.5,
) -> dict:
    """ToothFairy3 labels -> separate maxilla / mandible meshes, shared origin,
    Z flipped so Superior is up (parity: dicom_loader.py:254-311)."""
    if include_upper_labels is None:
        include_upper_labels = [2] + UPPER_TEETH_LABELS
    if include_lower_labels is None:
        include_lower_labels = [1] + LOWER_TEETH_LABELS
    if not include_upper_labels and not include_lower_labels:
        raise ValueError("At least one upper or lower label must be selected.")

    volume, spacing, affine = nifti_to_volume(label_path)
    vol_int = volume.astype(np.int64)

    upper_mask = np.isin(vol_int, include_upper_labels).astype(np.float32)
    lower_mask = np.isin(vol_int, include_lower_labels).astype(np.float32)

    maxilla = _volume_mask_to_mesh(upper_mask, spacing, affine, smooth_iterations, decimate_fraction)
    mandible = _volume_mask_to_mesh(lower_mask, spacing, affine, smooth_iterations, decimate_fraction)

    if maxilla.n_points and mandible.n_points:
        combined = maxilla.merge(mandible)
    elif maxilla.n_points:
        combined = maxilla.copy()
    else:
        combined = mandible.copy()

    origin = combined.center
    for m in (maxilla, mandible, combined):
        if m.n_points:
            m.translate(-origin, inplace=True)
            m.vertices[:, 2] *= -1.0          # Z-flip: Superior = +Z

    return {
        "maxilla_mesh": maxilla,
        "mandible_mesh": mandible,
        "combined_mesh": combined,
    }


def nifti_label_to_bone_mesh(
    label_path: str,
    include_labels=None,
    smooth_iterations: int = 30,
    decimate_fraction: float = 0.5,
) -> TriMesh:
    """Selected NIfTI labels -> single centered bone mesh."""
    if include_labels is None:
        include_labels = [1, 2]
    volume, spacing, affine = nifti_to_volume(label_path)
    mask = np.isin(volume.astype(np.int64), include_labels).astype(np.float32)
    if mask.sum() == 0:
        raise ValueError(f"No voxels found for labels {include_labels} in {label_path}.")
    mesh = _volume_mask_to_mesh(mask, spacing, affine, smooth_iterations, decimate_fraction)
    if mesh.n_points:
        mesh.translate(-mesh.center, inplace=True)
    return mesh


def nifti_image_to_bone_mesh(
    image_path: str,
    hu_threshold: float = 300.0,
    smooth_iterations: int = 30,
    decimate_fraction: float = 0.5,
) -> TriMesh:
    """Raw NIfTI CBCT image -> bone mesh via HU thresholding."""
    volume, spacing, affine = nifti_to_volume(image_path)
    mask = (volume >= hu_threshold).astype(np.float32)
    mesh = _volume_mask_to_mesh(mask, spacing, affine, smooth_iterations, decimate_fraction)
    if mesh.n_points:
        mesh.translate(-mesh.center, inplace=True)
    return mesh
