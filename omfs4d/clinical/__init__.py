from omfs4d.clinical.loader import (  # noqa: F401
    TOOTHFAIRY_LABELS,
    UPPER_TEETH_LABELS,
    LOWER_TEETH_LABELS,
    ALL_TEETH_LABELS,
    dicom_to_bone_mesh,
    load_dicom_volume,
    nifti_image_to_bone_mesh,
    nifti_label_to_bone_mesh,
    nifti_label_to_separate_meshes,
)
from omfs4d.clinical.surgical import SurgicalCutter  # noqa: F401
from omfs4d.clinical.segmentation import segment_volume, register_segmenter  # noqa: F401
