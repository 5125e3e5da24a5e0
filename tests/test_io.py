"""IO layer round-trip tests: NIfTI, DICOM, PLY, OBJ, STL."""

import numpy as np
import pytest

from omfs4d.io.nifti import load_nifti, save_nifti
from omfs4d.io.dicom import load_dicom_series, write_dicom_slice
from omfs4d.io.ply import load_ply, save_ply
from omfs4d.io.meshio import save_mesh, load_mesh


def test_nifti_roundtrip(tmp_path):
    vol = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    affine = np.diag([1.0, 2.0, 3.0, 1.0])
    affine[:3, 3] = [10, 20, 30]
    p = tmp_path / "x.nii.gz"
    save_nifti(p, vol, affine=affine, spacing=(1.0, 2.0, 3.0))
    vol2, spacing, affine2 = load_nifti(p)
    np.testing.assert_allclose(vol2, vol)
    np.testing.assert_allclose(affine2, affine)
    assert spacing == (1.0, 2.0, 3.0)


def test_nifti_int_labels(tmp_path):
    vol = np.zeros((4, 4, 4), dtype=np.int16)
    vol[1:3, 1:3, 1:3] = 2
    p = tmp_path / "labels.nii"
    save_nifti(p, vol)
    vol2, _, _ = load_nifti(p)
    assert vol2.dtype == np.float32
    np.testing.assert_allclose(vol2, vol)


def test_dicom_series_roundtrip(tmp_path):
    # 5 slices with slope/intercept HU rescale and out-of-order filenames
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 3000, size=(5, 8, 8)).astype(np.int16)
    z_positions = [4.0, 0.0, 2.0, 3.0, 1.0]
    for i, z in enumerate(z_positions):
        write_dicom_slice(
            tmp_path / f"slice_{i}.dcm",
            raw[i],
            position=(0.0, 0.0, z),
            pixel_spacing=(0.5, 0.75),
            rescale_slope=1.0,
            rescale_intercept=-1024.0,
        )
    vol, spacing = load_dicom_series(tmp_path)
    assert vol.shape == (5, 8, 8)
    assert spacing == (1.0, 0.5, 0.75)
    order = np.argsort(z_positions)
    np.testing.assert_allclose(vol, raw[order].astype(np.float32) - 1024.0)


def test_dicom_rle_series_roundtrip(tmp_path):
    """RLE Lossless (1.2.840.10008.1.2.5): a compressed series decodes
    bit-exactly (first-party PackBits over the DICOM byte-segment
    composite; ref pydicom surface: dicom_loader.py:97-103)."""
    from omfs4d.io.dicom import RLE_LOSSLESS

    rng = np.random.default_rng(7)
    # mix of flat runs (RLE-friendly) and noise (literal runs)
    raw = rng.integers(-1024, 3000, size=(4, 16, 16)).astype(np.int16)
    raw[:, :8, :] = -1000          # air plateau -> long replicate runs
    for i in range(4):
        write_dicom_slice(
            tmp_path / f"s{i}.dcm", raw[i], position=(0.0, 0.0, float(i)),
            rescale_slope=1.0, rescale_intercept=0.0,
            transfer_syntax=RLE_LOSSLESS,
        )
    vol, spacing = load_dicom_series(tmp_path)
    assert vol.shape == (4, 16, 16)
    np.testing.assert_array_equal(vol, raw.astype(np.float32))


def test_dicom_rle_packbits_edge_cases():
    """PackBits encoder/decoder invariants: long runs (>128), literal-only
    data, and odd lengths (pad byte)."""
    from omfs4d.io.dicom import _packbits_decode, _packbits_encode

    cases = [
        np.zeros(300, np.uint8),                       # single long run
        np.arange(200, dtype=np.uint8),                # literal-only
        np.asarray([1, 1, 1, 2, 3, 3, 3, 3, 9], np.uint8),
        np.asarray([5], np.uint8),
    ]
    for data in cases:
        enc = _packbits_encode(data)
        dec = _packbits_decode(enc, len(data))
        np.testing.assert_array_equal(dec, data)


def test_dicom_jpeg_baseline_series(tmp_path):
    """JPEG Baseline (1.2.840.10008.1.2.4.50): encapsulated 8-bit slices
    decode through PIL to within lossy-JPEG tolerance."""
    pytest.importorskip("PIL")
    from omfs4d.io.dicom import JPEG_BASELINE

    rng = np.random.default_rng(3)
    smooth = np.clip(
        128 + 60 * np.sin(np.linspace(0, 3, 32))[None, :, None]
        + rng.normal(0, 2, (3, 32, 32)), 0, 255).astype(np.uint8)
    for i in range(3):
        write_dicom_slice(
            tmp_path / f"s{i}.dcm", smooth[i], position=(0.0, 0.0, float(i)),
            transfer_syntax=JPEG_BASELINE,
        )
    vol, _ = load_dicom_series(tmp_path)
    assert vol.shape == (3, 32, 32)
    assert np.abs(vol - smooth.astype(np.float32)).mean() < 4.0


def test_dicom_unsupported_syntax_is_crisp(tmp_path):
    """An unsupported transfer syntax must fail loudly NAMING the UID, not
    skip silently into an empty-series mystery."""
    from omfs4d.io.dicom import UnsupportedTransferSyntaxError

    write_dicom_slice(tmp_path / "s0.dcm",
                      np.zeros((4, 4), np.int16), position=(0, 0, 0))
    # rewrite the meta transfer-syntax UID to Explicit VR BIG Endian
    # (same padded length, so the meta group still parses)
    blob = (tmp_path / "s0.dcm").read_bytes()
    blob = blob.replace(b"1.2.840.10008.1.2.1 ",
                        b"1.2.840.10008.1.2.2 ")
    (tmp_path / "s0.dcm").write_bytes(blob)
    with pytest.raises(UnsupportedTransferSyntaxError) as e:
        load_dicom_series(tmp_path)
    assert "1.2.840.10008.1.2.2" in str(e.value)


def test_ply_roundtrip_binary(tmp_path):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], dtype=np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
    p = tmp_path / "m.ply"
    save_ply(p, verts, faces, binary=True)
    data = load_ply(p)
    v = data["vertex"]
    np.testing.assert_allclose(np.stack([v["x"], v["y"], v["z"]], 1), verts)
    np.testing.assert_array_equal(data["face"], faces)


def test_ply_roundtrip_ascii_props(tmp_path):
    props = {
        "x": np.array([0.0, 1.0], dtype=np.float32),
        "y": np.array([2.0, 3.0], dtype=np.float32),
        "z": np.array([4.0, 5.0], dtype=np.float32),
        "opacity": np.array([0.5, 0.25], dtype=np.float32),
    }
    p = tmp_path / "pts.ply"
    save_ply(p, props, binary=False)
    data = load_ply(p)
    np.testing.assert_allclose(data["vertex"]["opacity"], props["opacity"])


@pytest.mark.parametrize("ext", ["stl", "obj", "ply"])
def test_mesh_export_roundtrip(tmp_path, ext):
    verts = np.array([[0, 0, 0], [2, 0, 0], [0, 2, 0], [0, 0, 2]], dtype=np.float32)
    faces = np.array([[0, 1, 2], [0, 1, 3], [1, 2, 3]], dtype=np.int32)
    p = tmp_path / f"m.{ext}"
    save_mesh(p, verts, faces)
    v2, f2 = load_mesh(p)
    assert f2.shape[0] == 3
    # vertex set must match (order may differ for STL dedup)
    got = set(map(tuple, np.round(v2, 4)))
    want = set(map(tuple, np.round(verts, 4)))
    assert got == want
