from mpc_limx_control_tpu.models import double_integrator  # noqa: F401
