from dhaug_tpu.parallel import mesh, sharded  # noqa: F401
