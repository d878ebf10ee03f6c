from lcgan_tpu.parallel.mesh import make_mesh, process_barrier, replicate, shard_batch

__all__ = ["make_mesh", "process_barrier", "replicate", "shard_batch"]
