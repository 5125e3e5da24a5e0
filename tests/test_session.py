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


class TestDashboardParity:
    """Round-2 UI parity surface: measurements list, save state, selectable
    export, WebGL preview scenes, stage progress (ref app.py:729-1162,
    1279-1323, 1480-1498)."""

    def test_measurement_records(self, session):
        rec = session.add_measurement("distance", [(0, 0, 0), (3, 4, 0)])
        assert rec["value"] == "5.00 mm"
        rec2 = session.add_measurement("angle",
                                       [(-1, 0, 0), (0, 0, 0), (0, 1, 0)])
        assert rec2["value"] == "90.0°"
        assert len(session.measurements) == 2
        session.delete_measurement(0)
        assert session.measurements[0]["type"] == "angle"
        session.clear_measurements()
        assert not session.measurements
        with pytest.raises(ValueError):
            session.add_measurement("area", [(0, 0, 0)])

    def test_save_state_and_history_info(self, session):
        session.save_state()
        session.movement.maxilla_mm = 7.0
        assert session.history_info == (1, 1)
        session.undo()
        assert session.movement.maxilla_mm == 0.0
        assert session.history_info == (0, 1)

    def test_selectable_segment_export(self, session, tmp_path):
        all_path = session.export(tmp_path / "all.stl")
        one_path = session.export(tmp_path / "one.stl",
                                  include=("mobile_maxilla",))
        va, _ = load_mesh(all_path)
        vo, _ = load_mesh(one_path)
        assert len(vo) < len(va)
        with pytest.raises(RuntimeError):
            session.export(tmp_path / "none.stl", include=("nonexistent",))

    def test_ascii_stl_roundtrip(self, session, tmp_path):
        p_bin = session.export(tmp_path / "b.stl", include=("mobile_maxilla",))
        p_asc = session.export(tmp_path / "a.stl", include=("mobile_maxilla",),
                               stl_ascii=True)
        assert p_asc.read_bytes()[:6] == b"solid "
        vb, fb = load_mesh(p_bin)
        va, fa = load_mesh(p_asc)
        assert fa.shape == fb.shape
        np.testing.assert_allclose(np.sort(va, axis=0), np.sort(vb, axis=0),
                                   atol=1e-4)

    def test_export_filename_contract(self, session):
        session.set_movement(maxilla_mm=5.0, mandible_mm=-3.0)
        assert (session.export_filename("stl")
                == "surgical_plan_maxilla+5.0mm_mandible-3.0mm.stl")

    def test_preview_and_moved_scenes(self, session, tmp_path):
        scene = session.preview_scene(lefort_z=20, bsso_l_x=-15, bsso_r_x=15)
        names = {m["name"] for m in scene}
        assert {"lefort", "bsso_l", "bsso_r"} <= names
        assert {"maxilla", "mandible"} <= names    # demo has separate meshes
        moved = session.moved_scene()
        mnames = {m["name"] for m in moved}
        assert "mobile_maxilla" in mnames and "distal_mandible" in mnames
        # every entry carries renderable geometry
        for m in scene + moved:
            assert len(m["positions"]) % 9 == 0 and len(m["positions"]) > 0
            assert len(m["normals"]) == len(m["positions"])

    def test_preview_html_standalone(self, session, tmp_path):
        p = session.write_preview_html(tmp_path / "prev.html",
                                       lefort_z=20, bsso_l_x=-15, bsso_r_x=15)
        html = p.read_text()
        assert "<canvas" in html and "webgl" in html
        assert "lefort" in html
        assert "http" not in html.split("<script>")[1]   # no CDN/network deps


class TestStageProgress:
    def test_event_mapping_monotone(self):
        from omfs4d.app.progress import progress_of_events
        events = [
            {"event": "stage_start", "stage": "preprocess"},
            {"event": "stage_end", "stage": "preprocess"},
            {"event": "track_stage", "stage": "lmk_init_rigid"},
            {"event": "track_stage", "stage": "global_optimization_0"},
            {"event": "track_stage", "stage": "lmk_init_all"},   # late repeat
        ]
        pct, status = progress_of_events(events)
        assert pct == 80 and "Global" in status

    def test_read_progress_file(self, tmp_path):
        import json
        from omfs4d.app.progress import read_progress
        assert read_progress(tmp_path / "missing.jsonl") == (0, "Waiting...")
        p = tmp_path / "events.jsonl"
        p.write_text(json.dumps({"event": "stage_end", "stage": "render"})
                     + "\nnot json\n")
        pct, status = read_progress(p)
        assert pct == 100
