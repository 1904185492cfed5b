from thormang_isaacgym_tpu.parity.harness import record_trajectory  # noqa: F401
