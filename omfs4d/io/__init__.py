from omfs4d.io.nifti import load_nifti, save_nifti  # noqa: F401
from omfs4d.io.dicom import load_dicom_series, write_dicom_slice  # noqa: F401
from omfs4d.io.ply import load_ply, save_ply  # noqa: F401
from omfs4d.io.meshio import save_mesh, load_obj, save_obj, save_stl, load_stl  # noqa: F401
