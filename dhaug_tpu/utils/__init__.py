from dhaug_tpu.utils import checkpoint, log  # noqa: F401
