from .mesh import make_mesh, replicated, batch_sharded
from .distill import make_parallel_train_step
