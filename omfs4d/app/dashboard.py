"""Two-tab web dashboard (parity surface for the reference's app.py).

Runs wherever streamlit is installed:

    streamlit run omfs4d/app/dashboard.py

Tab 1 (Clinical): upload DICOM/NIfTI or demo spheres -> cut-plane sliders ->
perform osteotomies -> move segments (undo/redo) -> export STL/PLY/OBJ.
Tab 2 (Visual): dataset selection -> avatar training -> surgical prediction
render driven by Tab 1's maxilla/mandible mm (the two-scalar bridge,
ref: app.py:1438-1458).

All logic lives in omfs4d.app.session / omfs4d.pipeline — this file is
presentation only, so every headless environment keeps full functionality
through the CLI.
"""

from __future__ import annotations

import tempfile
from pathlib import Path

try:
    import streamlit as st
except ImportError as e:  # pragma: no cover - UI only runs with streamlit
    raise SystemExit(
        "The dashboard needs streamlit (`pip install streamlit`). "
        "All functionality is available headless via "
        "`python -m omfs4d.pipeline.cli`."
    ) from e

from omfs4d.app.session import PlanningSession
from omfs4d.core.config import Config

st.set_page_config(page_title="omfs4d", layout="wide")

if "session" not in st.session_state:
    st.session_state.session = PlanningSession()
    st.session_state.cut_done = False
session: PlanningSession = st.session_state.session

tab1, tab2 = st.tabs(["🦴 Clinical Planning", "🎭 4D Prediction"])

with tab1:
    st.header("Step 1 — Load anatomy")
    col1, col2 = st.columns(2)
    with col1:
        up = st.file_uploader("DICOM series (.dcm, multiple)",
                              accept_multiple_files=True)
        if up and st.button("Extract Bone from DICOM"):
            from omfs4d.clinical.loader import dicom_to_bone_mesh
            with tempfile.TemporaryDirectory() as d:
                for f in up:
                    (Path(d) / f.name).write_bytes(f.getvalue())
                mesh = dicom_to_bone_mesh(d)
            session.load_meshes(mesh)
            st.success(f"mesh: {mesh.n_points} pts / {mesh.n_faces} tris")
    with col2:
        nifti = st.file_uploader("ToothFairy3 labels (.nii.gz)")
        if nifti and st.button("Extract Jaws from NIfTI"):
            from omfs4d.clinical.loader import nifti_label_to_separate_meshes
            with tempfile.NamedTemporaryFile(suffix=".nii.gz", delete=False) as f:
                f.write(nifti.getvalue())
                out = nifti_label_to_separate_meshes(f.name)
            session.load_meshes(out["maxilla_mesh"], out["mandible_mesh"])
            st.success("separate maxilla + mandible loaded")
        if st.button("Demo spheres"):
            session.load_demo_sphere()
            st.success("demo anatomy loaded")

    if session.maxilla is not None:
        st.header("Step 2 — Osteotomy planes")
        b = session.maxilla.bounds
        lefort_z = st.slider("Le Fort I height (Z)", float(b[4]), float(b[5]),
                             float((b[4] + b[5]) / 2))
        bsso_l = st.slider("BSSO left (X)", float(b[0]), float(b[1]),
                           float(b[0]) * 0.5)
        bsso_r = st.slider("BSSO right (X)", float(b[0]), float(b[1]),
                           float(b[1]) * 0.5)
        if st.button("Perform Osteotomies"):
            result = session.perform_cut(lefort_z=lefort_z, bsso_l_x=bsso_l,
                                         bsso_r_x=bsso_r)
            st.session_state.cut_done = True
            for w in result.get("_warnings", []):
                st.warning(w)
            st.success("4 segments created")

    if st.session_state.cut_done:
        st.header("Step 3 — Move segments")
        c1, c2, c3 = st.columns(3)
        with c1:
            mx = st.slider("Maxilla advancement (mm)", -15.0, 15.0,
                           session.movement.maxilla_mm)
        with c2:
            md = st.slider("Mandible advancement (mm)", -15.0, 15.0,
                           session.movement.mandible_mm)
        with c3:
            u, r = st.columns(2)
            if u.button("Undo", disabled=not session.can_undo):
                session.undo()
            if r.button("Redo", disabled=not session.can_redo):
                session.redo()
        if (mx, md) != (session.movement.maxilla_mm, session.movement.mandible_mm):
            session.set_movement(maxilla_mm=mx, mandible_mm=md)

        st.header("Step 4 — Export")
        fmt = st.selectbox("format", ["stl", "ply", "obj"])
        if st.button("Export plan mesh"):
            out = Path(tempfile.mkdtemp()) / f"plan.{fmt}"
            session.export(out)
            st.download_button("Download", out.read_bytes(), f"plan.{fmt}")

with tab2:
    st.header("4D surgical prediction")
    plan = session.surgical_plan()
    st.info(f"plan from Tab 1: maxilla {plan['maxilla_mm']:.1f} mm, "
            f"mandible {plan['mandible_mm']:.1f} mm")
    data_dir = st.text_input("dataset directory", "omfs4d_work/data")
    model_dir = st.text_input("model directory", "omfs4d_work/model")
    iters = st.select_slider("training iterations",
                             [5000, 30000, 100000, 600000], 30000)
    if st.button("Train avatar"):
        from omfs4d.pipeline.runner import Pipeline
        pipe = Pipeline(Config(), "omfs4d_work")
        with st.spinner("training…"):
            pipe.train(Path(data_dir), Path(model_dir), iterations=iters)
        st.success("training complete")
    if st.button("Render prediction"):
        from omfs4d.pipeline.runner import Pipeline
        pipe = Pipeline(Config(), "omfs4d_work")
        with st.spinner("rendering…"):
            result = pipe.render_surgery(
                Path(model_dir), Path(data_dir),
                Path("omfs4d_work/prediction.mp4"),
                lefort_mm=plan["maxilla_mm"], bsso_mm=plan["mandible_mm"],
            )
        st.video(result["video"])
