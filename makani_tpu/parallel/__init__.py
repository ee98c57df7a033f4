from .mesh import (
    init,
    get_mesh,
    axis_size,
    is_distributed,
    mesh_axes,
    model_axes,
    cleanup,
)
