"""Utility tests: rotations, checkpointing, profiling helpers."""

import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.utils import checkpoint as ckpt
from mpc_limx_control_tpu.utils import profiling as prof
from mpc_limx_control_tpu.utils import rotations as rot


def test_quat_rot_roundtrip():
    rng = np.random.default_rng(0)
    rpy = jnp.asarray(rng.uniform(-1.0, 1.0, (16, 3)))
    q = rot.rpy_to_quat(rpy)
    back = rot.quat_to_rpy(q)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rpy),
                               atol=1e-10)


def test_rpy_rot_matrix_orthonormal():
    rpy = jnp.asarray([0.3, -0.2, 1.1])
    R = np.asarray(rot.rpy_to_rot(rpy))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)


def test_quat_to_zyx_matches_reference_formula():
    """Against the literal quatToZyx math (include/stateEstimator.h:76-84)."""
    q = np.array([0.1, -0.2, 0.3, 0.9])
    q = q / np.linalg.norm(q)
    x, y, z, w = q
    yaw = np.arctan2(2 * (x * y + w * z), w * w + x * x - y * y - z * z)
    pitch = np.arcsin(min(-2 * (x * z - w * y), 0.99999))
    roll = np.arctan2(2 * (y * z + w * x), w * w - x * x - y * y + z * z)
    out = np.asarray(rot.quat_to_zyx(jnp.asarray(q)))
    np.testing.assert_allclose(out, [yaw, pitch, roll], atol=1e-12)


def test_checkpoint_roundtrip():
    tree = {"xi": jnp.arange(12.0).reshape(3, 4),
            "q": jnp.ones((3, 6), jnp.float32)}
    with tempfile.TemporaryDirectory() as d:
        path = Path(d) / "state"
        ckpt.save(path, tree)
        restored = ckpt.restore(path, tree)
    np.testing.assert_allclose(np.asarray(restored["xi"]),
                               np.asarray(tree["xi"]))
    np.testing.assert_allclose(np.asarray(restored["q"]),
                               np.asarray(tree["q"]))


def test_measure_throughput():
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((64, 8))
    stats = prof.measure_throughput(f, (x,), batch=64, iters=3)
    assert stats["solves_per_s"] > 0
    assert stats["p50_s"] >= 0


def test_metrics_logger(tmp_path):
    p = tmp_path / "m.jsonl"
    with prof.MetricsLogger(p) as log:
        log.log(0, err=jnp.asarray(0.5), vec=jnp.asarray([1.0, 2.0]))
        log.log(1, err=0.25)
    lines = p.read_text().strip().splitlines()
    assert len(lines) == 2
    import json
    rec = json.loads(lines[0])
    assert rec["step"] == 0 and rec["vec"] == [1.0, 2.0]
