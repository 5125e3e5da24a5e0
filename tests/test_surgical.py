"""Golden behavior tests for the osteotomy simulator.

Ports the reference's invariant suite (ref: test/test_surgical_sim.py):
synthetic spheres stand in for maxilla (z=+20) and mandible (z=-20); the
same 4-segment contract, segment independence, translation magnitudes and
error cases are asserted against the first-party implementation.
"""

import numpy as np
import pytest

from omfs4d.clinical.surgical import SurgicalCutter
from omfs4d.ops.primitives import make_sphere_mesh


@pytest.fixture
def cutter():
    maxilla = make_sphere_mesh(radius=30, center=(0, 0, 20), res=20)
    mandible = make_sphere_mesh(radius=30, center=(0, 0, -20), res=20)
    return SurgicalCutter(maxilla, mandible)


class TestSeparateMeshes:
    def test_preview_returns_expected_keys(self, cutter):
        result = cutter.preview_planes(lefort_z=20, bsso_l_x=-15, bsso_r_x=15)
        for key in ("maxilla", "mandible", "combined", "lefort", "bsso_l", "bsso_r"):
            assert key in result

    def test_perform_cut_returns_four_segments(self, cutter):
        result = cutter.perform_cut(lefort_z=20, bsso_l_x=-15, bsso_r_x=15)
        for key in ("upper_skull", "mobile_maxilla", "distal_mandible", "proximal_rami"):
            assert key in result

    def test_mandible_parts_nonempty(self, cutter):
        result = cutter.perform_cut(lefort_z=20, bsso_l_x=-15, bsso_r_x=15)
        assert result["distal_mandible"].n_points > 0
        assert result["proximal_rami"].n_points > 0

    def test_move_maxilla_does_not_move_mandible(self, cutter):
        cutter.perform_cut(lefort_z=20, bsso_l_x=-15, bsso_r_x=15)
        mand_orig = np.array(cutter.distal_mandible.center)
        moved = cutter.move_segments(maxilla_mm=10.0, mandible_mm=0.0)
        np.testing.assert_array_almost_equal(mand_orig, moved["distal_mandible"].center)

    def test_move_mandible_does_not_move_maxilla(self, cutter):
        cutter.perform_cut(lefort_z=20, bsso_l_x=-15, bsso_r_x=15)
        max_orig = np.array(cutter.mobile_maxilla.center)
        moved = cutter.move_segments(maxilla_mm=0.0, mandible_mm=10.0)
        np.testing.assert_array_almost_equal(max_orig, moved["mobile_maxilla"].center)

    def test_move_segments_translates_correctly(self, cutter):
        cutter.perform_cut(lefort_z=20, bsso_l_x=-15, bsso_r_x=15)
        max_orig = np.array(cutter.mobile_maxilla.center)
        mand_orig = np.array(cutter.distal_mandible.center)
        moved = cutter.move_segments(maxilla_mm=5.0, mandible_mm=8.0)
        np.testing.assert_almost_equal(
            np.array(moved["mobile_maxilla"].center)[1] - max_orig[1], 5.0, decimal=1
        )
        np.testing.assert_almost_equal(
            np.array(moved["distal_mandible"].center)[1] - mand_orig[1], 8.0, decimal=1
        )

    def test_move_without_cut_raises(self, cutter):
        with pytest.raises(RuntimeError):
            cutter.move_segments(maxilla_mm=5.0)

    def test_fixed_segments_stay_fixed(self, cutter):
        cutter.perform_cut(lefort_z=20, bsso_l_x=-15, bsso_r_x=15)
        skull_orig = np.array(cutter.upper_skull.center)
        rami_orig = np.array(cutter.proximal_rami.center)
        moved = cutter.move_segments(maxilla_mm=10.0, mandible_mm=10.0)
        np.testing.assert_array_almost_equal(skull_orig, moved["upper_skull"].center)
        np.testing.assert_array_almost_equal(rami_orig, moved["proximal_rami"].center)

    def test_custom_direction(self, cutter):
        cutter.perform_cut(lefort_z=20, bsso_l_x=-15, bsso_r_x=15)
        max_orig = np.array(cutter.mobile_maxilla.center)
        moved = cutter.move_segments(
            maxilla_mm=5.0, mandible_mm=0.0, advancement_direction=(1.0, 0.0, 0.0)
        )
        delta = np.array(moved["mobile_maxilla"].center) - max_orig
        np.testing.assert_allclose(delta, [5.0, 0.0, 0.0], atol=0.1)

    def test_zero_direction_rejected(self, cutter):
        cutter.perform_cut(lefort_z=20, bsso_l_x=-15, bsso_r_x=15)
        with pytest.raises(ValueError):
            cutter.move_segments(
                maxilla_mm=1.0, mandible_mm=1.0, advancement_direction=(0.0, 0.0, 0.0)
            )

    def test_upper_skull_above_mobile_maxilla(self, cutter):
        result = cutter.perform_cut(lefort_z=20, bsso_l_x=-15, bsso_r_x=15)
        if result["upper_skull"].n_points and result["mobile_maxilla"].n_points:
            upper_z = float(result["upper_skull"].center[2])
            mobile_z = float(result["mobile_maxilla"].center[2])
            assert upper_z > mobile_z

    def test_rotation_about_centroid_keeps_center(self, cutter):
        cutter.perform_cut(lefort_z=20, bsso_l_x=-15, bsso_r_x=15)
        orig = np.array(cutter.distal_mandible.center)
        moved = cutter.move_segments(mandible_rotation=(10.0, 5.0, -3.0))
        np.testing.assert_allclose(moved["distal_mandible"].center, orig, atol=0.5)


class TestSingleMesh:
    def setup_method(self):
        self.mesh = make_sphere_mesh(radius=50, center=(0, 0, 0), res=30)
        self.cutter = SurgicalCutter(self.mesh)

    def test_perform_cut_works(self):
        result = self.cutter.perform_cut(lefort_z=0, bsso_l_x=-20, bsso_r_x=20)
        assert result["upper_skull"].n_points > 0

    def test_preview_works(self):
        result = self.cutter.preview_planes(lefort_z=0, bsso_l_x=-20, bsso_r_x=20)
        assert "combined" in result

    def test_lefort_flip(self):
        r1 = self.cutter.perform_cut(lefort_z=0, bsso_l_x=-20, bsso_r_x=20, lefort_flip=False)
        up1 = float(r1["upper_skull"].center[2])
        r2 = self.cutter.perform_cut(lefort_z=0, bsso_l_x=-20, bsso_r_x=20, lefort_flip=True)
        up2 = float(r2["upper_skull"].center[2])
        assert up1 > 0 > up2
