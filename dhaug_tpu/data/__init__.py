from dhaug_tpu.data import h36m, skeleton, loaders, synthetic  # noqa: F401
