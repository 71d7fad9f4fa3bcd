from mpc_limx_control_tpu.oracle.qp_oracle import solve_qp_oracle  # noqa: F401
from mpc_limx_control_tpu.oracle import pipeline  # noqa: F401
