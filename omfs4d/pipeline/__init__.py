from omfs4d.pipeline.runner import Pipeline  # noqa: F401
