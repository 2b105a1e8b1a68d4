from .mesh import make_mesh, replicated, batch_sharded
from .distill import make_parallel_train_step
from .points import decode_points_sharded, sigma_grid_sharded
from .render import render_latency_sharded
