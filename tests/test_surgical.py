"""Osteotomy-simulator golden invariants.

The behavioral contract being locked down (same invariants the reference's
suite checks, ref: test/test_surgical_sim.py, re-expressed in pytest style
on this framework's synthetic fixtures): the 4-segment cut result, segment
independence under movement, translation magnitudes along arbitrary unit
directions, centroid-preserving rotations, error handling, and the
single-mesh fallback with lefort_flip.
"""

import numpy as np
import pytest

from omfs4d.clinical.surgical import SurgicalCutter
from omfs4d.ops.primitives import make_sphere_mesh

CUT = dict(lefort_z=20, bsso_l_x=-15, bsso_r_x=15)
SEGMENTS = ("upper_skull", "mobile_maxilla", "distal_mandible", "proximal_rami")


@pytest.fixture
def cutter():
    """Synthetic jaws: spheres at z=+20 (maxilla) and z=-20 (mandible)."""
    return SurgicalCutter(
        make_sphere_mesh(radius=30, center=(0, 0, 20), res=20),
        make_sphere_mesh(radius=30, center=(0, 0, -20), res=20),
    )


def centers(result, *keys):
    return [np.array(result[k].center) for k in keys]


# ── contract shape ──────────────────────────────────────────


def test_preview_contract(cutter):
    out = cutter.preview_planes(**CUT)
    assert set(out) >= {"maxilla", "mandible", "combined",
                        "lefort", "bsso_l", "bsso_r"}


def test_cut_produces_four_nonempty_relevant_segments(cutter):
    out = cutter.perform_cut(**CUT)
    assert set(out) == set(SEGMENTS)
    assert out["distal_mandible"].n_points > 0
    assert out["proximal_rami"].n_points > 0


def test_upper_skull_sits_above_mobile_maxilla(cutter):
    out = cutter.perform_cut(**CUT)
    if out["upper_skull"].n_points and out["mobile_maxilla"].n_points:
        assert out["upper_skull"].center[2] > out["mobile_maxilla"].center[2]


# ── movement semantics ──────────────────────────────────────


@pytest.mark.parametrize("mobile,other,kw", [
    ("mobile_maxilla", "distal_mandible", dict(maxilla_mm=10.0)),
    ("distal_mandible", "mobile_maxilla", dict(mandible_mm=10.0)),
])
def test_segment_independence(cutter, mobile, other, kw):
    """Moving one mobile segment leaves the other untouched."""
    cutter.perform_cut(**CUT)
    before = np.array(getattr(cutter, other).center)
    moved = cutter.move_segments(**kw)
    np.testing.assert_array_almost_equal(before, moved[other].center)
    # and the moved one actually moved
    assert np.linalg.norm(
        np.array(moved[mobile].center) - getattr(cutter, mobile).center
    ) > 1.0


def test_translation_magnitudes_default_direction(cutter):
    """Default advancement is +Y; mm map 1:1 to world units."""
    cutter.perform_cut(**CUT)
    max0, mand0 = centers(
        {"a": cutter.mobile_maxilla, "b": cutter.distal_mandible}, "a", "b")
    moved = cutter.move_segments(maxilla_mm=5.0, mandible_mm=8.0)
    assert abs((moved["mobile_maxilla"].center[1] - max0[1]) - 5.0) < 0.05
    assert abs((moved["distal_mandible"].center[1] - mand0[1]) - 8.0) < 0.05


def test_translation_along_custom_unit_direction(cutter):
    cutter.perform_cut(**CUT)
    before = np.array(cutter.mobile_maxilla.center)
    moved = cutter.move_segments(maxilla_mm=5.0,
                                 advancement_direction=(1.0, 0.0, 0.0))
    np.testing.assert_allclose(
        np.array(moved["mobile_maxilla"].center) - before,
        [5.0, 0.0, 0.0], atol=0.1)


def test_fixed_segments_never_move(cutter):
    cutter.perform_cut(**CUT)
    skull0 = np.array(cutter.upper_skull.center)
    rami0 = np.array(cutter.proximal_rami.center)
    moved = cutter.move_segments(maxilla_mm=10.0, mandible_mm=10.0,
                                 maxilla_rotation=(5, 5, 5))
    np.testing.assert_array_almost_equal(skull0, moved["upper_skull"].center)
    np.testing.assert_array_almost_equal(rami0, moved["proximal_rami"].center)


def test_rotation_pivots_on_segment_centroid(cutter):
    cutter.perform_cut(**CUT)
    before = np.array(cutter.distal_mandible.center)
    moved = cutter.move_segments(mandible_rotation=(10.0, 5.0, -3.0))
    np.testing.assert_allclose(moved["distal_mandible"].center, before,
                               atol=0.5)


# ── error handling ──────────────────────────────────────────


def test_movement_requires_a_cut(cutter):
    with pytest.raises(RuntimeError):
        cutter.move_segments(maxilla_mm=5.0)


def test_zero_length_direction_rejected(cutter):
    cutter.perform_cut(**CUT)
    with pytest.raises(ValueError):
        cutter.move_segments(maxilla_mm=1.0,
                             advancement_direction=(0.0, 0.0, 0.0))


# ── single-mesh fallback ────────────────────────────────────


@pytest.fixture
def single():
    return SurgicalCutter(make_sphere_mesh(radius=50, res=30))


def test_single_mesh_cut_and_preview(single):
    assert single.perform_cut(
        lefort_z=0, bsso_l_x=-20, bsso_r_x=20)["upper_skull"].n_points > 0
    assert "combined" in single.preview_planes(
        lefort_z=0, bsso_l_x=-20, bsso_r_x=20)


def test_lefort_flip_swaps_mobile_side(single):
    up_default = single.perform_cut(
        lefort_z=0, bsso_l_x=-20, bsso_r_x=20)["upper_skull"].center[2]
    up_flipped = single.perform_cut(
        lefort_z=0, bsso_l_x=-20, bsso_r_x=20,
        lefort_flip=True)["upper_skull"].center[2]
    assert up_default > 0 > up_flipped
