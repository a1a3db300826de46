from forge_tpu.ops.grid_sample import grid_sample_3d
from forge_tpu.ops.voxel import volume_coord_grid, coord_grid_max, rotate_voxel_grids
from forge_tpu.ops.ray_march import (
    render_volume_xla,
    emission_absorption,
    render_volume,
)
