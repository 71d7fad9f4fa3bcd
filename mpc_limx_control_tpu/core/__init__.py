from mpc_limx_control_tpu.core import config, types  # noqa: F401
