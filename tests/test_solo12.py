import jax
import jax.numpy as jnp
import numpy as np

from qtos_tpu.models.solo12 import Solo12


def test_fk_nominal_stance_near_reference_start():
    """q_init stance should be symmetric and consistent with the reference's
    start height (data/config/solo12.yml: q_init with start_pos z=0.31)."""
    feet = Solo12.fk(Solo12.q_init)
    assert feet.shape == (4, 3)
    signs_x = np.array([1, 1, -1, -1])
    signs_y = np.array([1, -1, 1, -1])
    f = np.asarray(feet)
    np.testing.assert_allclose(f[:, 0], signs_x * 0.207, atol=0.01)
    np.testing.assert_allclose(f[:, 1], signs_y * 0.149, atol=0.01)
    np.testing.assert_allclose(f[:, 2], -0.291, atol=0.01)


def test_ik_fk_roundtrip_closed_form():
    rng = np.random.default_rng(0)
    # Random reachable joint configs (stay away from singular full extension).
    q = np.stack(
        [
            rng.uniform(-0.4, 0.4, size=(200,)),
            rng.uniform(-1.0, 1.0, size=(200,)),
            rng.uniform(0.3, 1.8, size=(200,)),
        ],
        axis=-1,
    ).astype(np.float32)
    for leg in range(4):
        q_leg = q * np.array([1.0, 1.0, float(Solo12._knee_dir(leg)) if hasattr(Solo12, "_knee_dir") else 1.0])
        # use the model's knee sign
        from qtos_tpu.models.solo12 import _KNEE_SIGN

        q_leg = q * np.array([1.0, 1.0, float(_KNEE_SIGN[leg])])
        p = Solo12.leg_fk(jnp.asarray(q_leg), leg)
        q_back = Solo12.leg_ik(p, leg)
        p_back = Solo12.leg_fk(q_back, leg)
        np.testing.assert_allclose(np.asarray(p_back), np.asarray(p), atol=1e-5)


def test_ik_stance_targets():
    """IK on the canonical stance targets must reproduce a config whose FK
    matches those targets exactly."""
    feet_target = Solo12.nominal_feet
    q = Solo12.ik(feet_target)
    feet = Solo12.fk(q)
    np.testing.assert_allclose(np.asarray(feet), np.asarray(feet_target), atol=1e-5)
    # knee directions follow the solo12 convention
    qs = np.asarray(q).reshape(4, 3)
    assert qs[0, 2] < 0 and qs[1, 2] < 0 and qs[2, 2] > 0 and qs[3, 2] > 0


def test_world_frame_roundtrip():
    base_pos = jnp.array([0.5, -0.2, 0.3])
    base_eul = jnp.array([0.05, -0.1, 0.6])
    q = Solo12.ik(Solo12.nominal_feet)
    feet_w = Solo12.fk_world(q, base_pos, base_eul)
    q2 = Solo12.ik_world(feet_w, base_pos, base_eul)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q), atol=1e-5)


def test_jacobian_matches_fd():
    q = Solo12.q_init
    J = Solo12.jacobians(q)
    eps = 1e-4
    for leg in range(4):
        for j in range(3):
            dq = np.zeros(12, np.float32)
            dq[leg * 3 + j] = eps
            fd = (np.asarray(Solo12.fk(q + dq)) - np.asarray(Solo12.fk(q - dq))) / (2 * eps)
            np.testing.assert_allclose(np.asarray(J[leg, :, j]), fd[leg], atol=1e-3)


def test_ik_dls_agrees_with_closed_form():
    target = Solo12.nominal_feet + jnp.asarray(
        np.random.default_rng(1).uniform(-0.03, 0.03, size=(4, 3)).astype(np.float32)
    )
    q_cf = Solo12.ik(target)
    q_dls = Solo12.ik_dls(target, Solo12.q_init, iters=30)
    feet_dls = Solo12.fk(q_dls)
    np.testing.assert_allclose(np.asarray(feet_dls), np.asarray(target), atol=1e-4)
    np.testing.assert_allclose(np.asarray(Solo12.fk(q_cf)), np.asarray(target), atol=1e-5)


def test_fk_ik_batched_vmap():
    rng = np.random.default_rng(2)
    feet = np.asarray(Solo12.nominal_feet)[None] + rng.uniform(
        -0.04, 0.04, size=(32, 4, 3)
    ).astype(np.float32)
    q = jax.vmap(Solo12.ik)(jnp.asarray(feet))
    back = jax.vmap(Solo12.fk)(q)
    np.testing.assert_allclose(np.asarray(back), feet, atol=1e-5)
