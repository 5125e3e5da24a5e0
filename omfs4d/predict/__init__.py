from omfs4d.predict.surgery import (  # noqa: F401
    SCALE_FACTOR,
    choose_rig_mode,
    compute_offset,
    create_modified_dataset,
    export_deterministic_frames,
    load_deformation_map,
    modify_flame_params,
)
from omfs4d.predict.render_video import render_prediction  # noqa: F401
