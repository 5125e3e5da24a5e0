from omfs4d.headrecon.pipeline import (  # noqa: F401
    build_canonical_head,
    evaluate_head_coverage,
    evaluate_multi_coverage,
    fit_shared_shape,
    ingest_sequences,
    register_sequences,
)
