"""Planning session: undo/redo history, surgical-plan bridge, export,
measurement tools (dashboard logic layer, ref: app.py)."""

import numpy as np
import pytest

from omfs4d.app.session import HISTORY_DEPTH, PlanningSession
from omfs4d.clinical.measure import angle_deg, distance_mm
from omfs4d.io.meshio import load_mesh


@pytest.fixture
def session():
    s = PlanningSession()
    s.load_demo_sphere()
    s.perform_cut(lefort_z=20, bsso_l_x=-15, bsso_r_x=15)
    return s


class TestHistory:
    def test_undo_redo_roundtrip(self, session):
        session.set_movement(maxilla_mm=5.0)
        session.set_movement(maxilla_mm=8.0)
        assert session.movement.maxilla_mm == 8.0
        session.undo()
        assert session.movement.maxilla_mm == 5.0
        session.undo()
        assert session.movement.maxilla_mm == 0.0
        session.redo()
        assert session.movement.maxilla_mm == 5.0

    def test_history_depth_capped(self, session):
        for i in range(HISTORY_DEPTH + 20):
            session.set_movement(maxilla_mm=float(i))
        assert len(session._undo) == HISTORY_DEPTH

    def test_new_edit_clears_redo(self, session):
        session.set_movement(maxilla_mm=5.0)
        session.undo()
        assert session.can_redo
        session.set_movement(mandible_mm=2.0)
        assert not session.can_redo

    def test_undo_empty_raises(self, session):
        with pytest.raises(RuntimeError):
            session.undo()

    def test_move_before_cut_raises(self):
        s = PlanningSession()
        s.load_demo_sphere()
        with pytest.raises(RuntimeError):
            s.set_movement(maxilla_mm=1.0)


class TestBridge:
    def test_surgical_plan_scalars(self, session):
        session.set_movement(maxilla_mm=4.0, mandible_mm=7.0)
        plan = session.surgical_plan()
        assert plan == {"maxilla_mm": 4.0, "mandible_mm": 7.0}


class TestExport:
    def test_export_stl(self, session, tmp_path):
        session.set_movement(maxilla_mm=3.0)
        p = session.export(tmp_path / "plan.stl")
        verts, faces = load_mesh(p)
        assert len(verts) > 100 and len(faces) > 100


class TestMeasure:
    def test_distance(self):
        assert distance_mm((0, 0, 0), (3, 4, 0)) == 5.0

    def test_angle(self):
        assert abs(angle_deg((1, 0, 0), (0, 0, 0), (0, 1, 0)) - 90.0) < 1e-9

    def test_angle_degenerate_raises(self):
        with pytest.raises(ValueError):
            angle_deg((0, 0, 0), (0, 0, 0), (1, 0, 0))

    def test_snap(self, session):
        d = session.measure_distance((0, 0, 52), (0, 0, -52),
                                     snap_mesh=session.maxilla.merge(session.mandible))
        assert abs(d - 100.0) < 2.0   # sphere poles at z=50 / z=-50
