from omfs4d.app.session import PlanningSession  # noqa: F401
