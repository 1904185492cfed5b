from thormang_isaacgym_tpu.ops.sim import (  # noqa: F401
    Controls, SimParams, build_step_fn, zero_controls,
)
from thormang_isaacgym_tpu.ops.kinematics import forward_kinematics  # noqa: F401
from thormang_isaacgym_tpu.ops.dynamics import aba  # noqa: F401
