from omfs4d.ops.mesh import TriMesh, plane_clip, laplacian_smooth  # noqa: F401
from omfs4d.ops.marching import marching_cubes  # noqa: F401
from omfs4d.ops.knn import knn_mean_distance  # noqa: F401
