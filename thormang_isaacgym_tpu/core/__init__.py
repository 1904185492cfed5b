from thormang_isaacgym_tpu.core import quat, spatial  # noqa: F401
