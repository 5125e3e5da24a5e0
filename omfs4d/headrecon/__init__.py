from omfs4d.headrecon.pipeline import (  # noqa: F401
    build_canonical_head,
    evaluate_head_coverage,
    ingest_sequences,
    register_sequences,
)
