from dhaug_tpu.train import config, posenet, state  # noqa: F401
