from .mesh import make_mesh, replicated, batch_sharding, make_sharded_train_step
