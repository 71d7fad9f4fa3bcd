from mpc_limx_control_tpu.parallel import mesh  # noqa: F401
