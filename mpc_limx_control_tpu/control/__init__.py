from mpc_limx_control_tpu.control import (  # noqa: F401
    controller,
    estimator,
    gait,
    linear_mpc,
)
