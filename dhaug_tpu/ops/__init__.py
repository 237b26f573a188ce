from dhaug_tpu.ops import camera, quaternion, fk, bones, metrics  # noqa: F401
