from dhaug_tpu.models import blocks, discriminators, generator, posenets  # noqa: F401
