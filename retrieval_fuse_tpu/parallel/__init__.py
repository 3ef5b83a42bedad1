from retrieval_fuse_tpu.parallel.mesh import get_mesh, shard_batch, replicate, data_parallel_jit

__all__ = ["get_mesh", "shard_batch", "replicate", "data_parallel_jit"]
