from mpc_limx_control_tpu.control import linear_mpc  # noqa: F401
