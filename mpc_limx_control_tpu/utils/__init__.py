from mpc_limx_control_tpu.utils import rotations  # noqa: F401
