"""Spatial (tile) and gaussian sharding for multi-chip rendering.

This is the framework's SP/EP analogue (SURVEY.md §2.3): a frame's tile
grid is embarrassingly parallel, so one frame can rasterize across the mesh
by sharding the per-tile lists; the only collective is the final
`all_gather` of tile colors over ICI.  Projection/binning stay replicated —
they are ~10% of frame time and sharding them would add a gaussian-axis
all-to-all (planned for very large avatars).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from omfs4d.ops.camera import Camera, project_gaussians
from omfs4d.render.rasterize import (
    TileBinning,
    _tile_pixel_centers,
    assemble_tiles,
    bin_gaussians,
    composite_tiles_xla,
)


def composite_tile_sharded(
    uv, conic, colors, opacity,
    binning: TileBinning,
    width: int, height: int, tile: int,
    mesh: Mesh, axis: str,
):
    """Composite with the tile dimension sharded over `axis` of `mesh`.

    Gaussian parameters are replicated; each device composites its
    contiguous slab of tiles and the image is all-gathered.
    """
    n_dev = mesh.shape[axis]
    grid_w = (width + tile - 1) // tile
    grid_h = (height + tile - 1) // tile
    num_tiles = grid_w * grid_h
    pad = (-num_tiles) % n_dev

    lists = jnp.pad(binning.tile_lists, ((0, pad), (0, 0)))
    counts = jnp.pad(binning.tile_counts, (0, pad))
    pix = jnp.pad(_tile_pixel_centers(grid_w, grid_h, tile),
                  ((0, pad), (0, 0), (0, 0)))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    def _local(uv_, conic_, colors_, opacity_, lists_, counts_, pix_):
        return composite_tiles_xla(uv_, conic_, colors_, opacity_,
                                   lists_, counts_, pix_)

    colors_out, alphas_out = _local(uv, conic, colors, opacity,
                                    lists, counts, pix)
    colors_out = colors_out[:num_tiles]
    alphas_out = alphas_out[:num_tiles]
    return assemble_tiles(colors_out, alphas_out, width, height, tile)


def rasterize_tile_sharded(
    means, rotations, scales, opacity, colors,
    camera: Camera,
    width: int, height: int,
    mesh: Mesh, axis: str = "tile",
    background=None,
    tile: int = 16,
    max_per_tile: int = 512,
    max_tiles_per_gaussian: int = 36,
):
    """Full single-frame rasterization spatially sharded over the mesh."""
    proj = project_gaussians(camera, means, rotations, scales)
    binning = bin_gaussians(
        jax.tree_util.tree_map(jax.lax.stop_gradient, proj),
        jax.lax.stop_gradient(opacity),
        width, height, tile, max_per_tile, max_tiles_per_gaussian,
    )
    img, alpha = composite_tile_sharded(
        proj["uv"], proj["conic"], colors, opacity, binning,
        width, height, tile, mesh, axis,
    )
    if background is None:
        background = jnp.ones((3,), jnp.float32)
    img = img + (1.0 - alpha)[..., None] * background
    return img, {"alpha": alpha, "overflow": binning.overflow}
