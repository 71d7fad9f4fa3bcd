from mpc_limx_control_tpu.ops import condense, discretize, qp  # noqa: F401
