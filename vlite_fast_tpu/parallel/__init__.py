from vlite_fast_tpu.parallel import mesh, halo, sharded_pipeline  # noqa: F401
