"""omfs4d — TPU-native 4D oral-maxillofacial-surgery planning & prediction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
cwlachap/OMFS-4D-Video-Gen reference platform:

  * Clinical engine: CT/CBCT (DICOM / NIfTI) -> bone segmentation -> surface
    mesh -> virtual osteotomies (Le Fort I + bilateral BSSO) -> segment motion
    -> mesh export.                       (ref: 01_Clinical_Engine/)
  * Visual engine: monocular video -> landmarks -> staged FLAME tracking ->
    mesh-bound 3D Gaussian Splatting avatar training -> surgical-plan FLAME
    perturbation -> 4D post-op prediction video.  (ref: 02_Visual_Engine/)

Everything heavy runs on a `jax.sharding.Mesh` of TPU devices: the
differentiable gaussian rasterizer is a Pallas kernel, FLAME LBS is batched
matmul on the MXU, frames are data-parallel over ICI, and the tile grid is
spatially sharded.  All IO (DICOM, NIfTI, PLY, video) is first-party.
"""

__version__ = "0.1.0"
