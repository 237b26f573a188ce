from dhaug_tpu.gan import traditional, wgan  # noqa: F401
