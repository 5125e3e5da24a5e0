"""Streamlit dashboard smoke test (runs wherever streamlit is installed).

The image this framework is developed in does not ship streamlit, so the
presentation layer (app/dashboard.py) cannot execute here — these tests
importorskip so any environment WITH streamlit exercises the wiring layer
via streamlit's AppTest harness (every logic layer below the dashboard has
its own headless tests in test_session / test_viewer / pipeline tests).
"""

from pathlib import Path

import pytest

pytest.importorskip("streamlit")
pytest.importorskip("streamlit.testing.v1")

from streamlit.testing.v1 import AppTest  # noqa: E402

DASHBOARD = str(Path(__file__).resolve().parent.parent
                / "omfs4d" / "app" / "dashboard.py")


def _boot() -> AppTest:
    at = AppTest.from_file(DASHBOARD, default_timeout=120)
    at.run()
    assert not at.exception, at.exception
    return at


def test_dashboard_boots_clean():
    at = _boot()
    # both tabs render; the clinical tab starts at Step 1
    assert any("Step 1" in h.value for h in at.header)


def test_demo_spheres_flow():
    at = _boot()
    demo = next(b for b in at.button if "Demo spheres" in str(b.label))
    demo.click()
    at.run()
    assert not at.exception
    # anatomy loaded -> Step 2 (cut planes) appears
    assert any("Step 2" in h.value for h in at.header)


def test_structure_checkboxes_exist():
    at = _boot()
    keys = {cb.key for cb in at.checkbox}
    assert {"inc_lower", "inc_upper", "inc_teeth"} <= keys
