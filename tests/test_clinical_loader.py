"""End-to-end clinical ingest: synthetic DICOM/NIfTI -> bone mesh."""

import numpy as np

from omfs4d.clinical.loader import (
    dicom_to_bone_mesh,
    nifti_label_to_separate_meshes,
    nifti_image_to_bone_mesh,
)
from omfs4d.io.dicom import write_dicom_slice
from omfs4d.io.nifti import save_nifti


def _make_sphere_ct(tmp_path, n=24, radius=8.0, hu_in=1200.0, hu_out=-1000.0):
    """Synthetic CT: sphere of bone-HU inside air."""
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2
    r = np.sqrt((z - c) ** 2 + (y - c) ** 2 + (x - c) ** 2)
    vol_hu = np.where(r < radius, hu_in, hu_out)
    # store as raw pixels with intercept -1024
    raw = (vol_hu + 1024.0).astype(np.int16)
    d = tmp_path / "series"
    d.mkdir()
    for i in range(n):
        write_dicom_slice(
            d / f"{i:03d}.dcm", raw[i], position=(0, 0, float(i)),
            pixel_spacing=(1.0, 1.0), rescale_intercept=-1024.0,
        )
    return d


def test_dicom_to_bone_mesh(tmp_path):
    series = _make_sphere_ct(tmp_path)
    mesh = dicom_to_bone_mesh(series, hu_threshold=300.0, smooth_iterations=5,
                              decimate_fraction=0.9)
    assert mesh.n_points > 50
    # centered at origin
    np.testing.assert_allclose(mesh.center, [0, 0, 0], atol=1e-3)
    # roughly spherical with radius ~8
    r = np.linalg.norm(mesh.vertices, axis=1)
    assert 6.0 < r.mean() < 9.0


def test_nifti_separate_meshes(tmp_path):
    n = 28
    vol = np.zeros((n, n, n), dtype=np.int16)
    i, j, k = np.mgrid[0:n, 0:n, 0:n]
    # identity affine: world z == voxel axis 2 (k)
    # "maxilla" blob (label 2) above (k=20), "mandible" (label 1) below (k=8)
    vol[(np.sqrt((i - 14) ** 2 + (j - 14) ** 2 + (k - 20) ** 2) < 5)] = 2
    vol[(np.sqrt((i - 14) ** 2 + (j - 14) ** 2 + (k - 8) ** 2) < 5)] = 1
    p = tmp_path / "labels.nii.gz"
    save_nifti(p, vol, affine=np.eye(4))
    out = nifti_label_to_separate_meshes(str(p), smooth_iterations=3,
                                         decimate_fraction=0.9)
    maxilla, mandible = out["maxilla_mesh"], out["mandible_mesh"]
    assert maxilla.n_points > 10 and mandible.n_points > 10
    # combined is centered; Z flipped so the high-k maxilla is now LOW in z
    # before flip maxilla sat at larger z -> after flip it must be below
    assert maxilla.center[2] < mandible.center[2]
    np.testing.assert_allclose(out["combined_mesh"].center, [0, 0, 0], atol=0.5)


def test_nifti_image_hu_threshold(tmp_path):
    n = 20
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    c = (n - 1) / 2
    r = np.sqrt((z - c) ** 2 + (y - c) ** 2 + (x - c) ** 2)
    vol = np.where(r < 6, 1500.0, -500.0).astype(np.float32)
    p = tmp_path / "ct.nii"
    save_nifti(p, vol, affine=np.eye(4))
    mesh = nifti_image_to_bone_mesh(str(p), hu_threshold=300.0,
                                    smooth_iterations=2, decimate_fraction=0.9)
    assert mesh.n_points > 20
    rr = np.linalg.norm(mesh.vertices, axis=1)
    assert 4.5 < rr.mean() < 7.0
