"""Spline kernels: cubic Hermite evaluation and natural cubic spline fitting.

The solver parameterizes base / end-effector motion on a uniform knot grid and
interpolates with cubic Hermite segments (position + velocity per knot), the
TPU-friendly analog of TOWR's Hermite node splines (reference: the 306-var
``base-lin``/``base-ang`` node sets in logs/towr_log.out:99-108).  Natural
cubic spline fitting replaces scipy.interpolate.CubicSpline used by the global
planner (reference: QTOS/planner.py:401-420) with a jittable Thomas solve.

Everything broadcasts over leading batch dimensions and is jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hermite_eval(x0, x1, v0, v1, dt, tau):
    """Evaluate a cubic Hermite segment at normalized time tau in [0, 1].

    Args:
      x0, x1: (..., d) endpoint values.
      v0, v1: (..., d) endpoint derivatives (per unit real time, segment
        duration ``dt``).
      dt: scalar segment duration.
      tau: (...,) normalized time.

    Returns:
      (pos, vel, acc): each (..., d); vel/acc are per unit real time.
    """
    t = tau[..., None]
    t2 = t * t
    t3 = t2 * t
    h00 = 2 * t3 - 3 * t2 + 1
    h10 = t3 - 2 * t2 + t
    h01 = -2 * t3 + 3 * t2
    h11 = t3 - t2
    pos = h00 * x0 + h10 * dt * v0 + h01 * x1 + h11 * dt * v1

    d00 = 6 * t2 - 6 * t
    d10 = 3 * t2 - 4 * t + 1
    d01 = -6 * t2 + 6 * t
    d11 = 3 * t2 - 2 * t
    vel = (d00 * x0 + d10 * dt * v0 + d01 * x1 + d11 * dt * v1) / dt

    a00 = 12 * t - 6
    a10 = 6 * t - 4
    a01 = -12 * t + 6
    a11 = 6 * t - 2
    acc = (a00 * x0 + a10 * dt * v0 + a01 * x1 + a11 * dt * v1) / (dt * dt)
    return pos, vel, acc


def sample_knots(knot_x: jax.Array, knot_v: jax.Array, dt, times: jax.Array):
    """Sample a uniform-knot Hermite spline at arbitrary times.

    Args:
      knot_x: (K, d) knot values.
      knot_v: (K, d) knot derivatives.
      dt: knot spacing (real time).
      times: (T,) query times in [0, (K-1)*dt].

    Returns:
      (pos, vel, acc): each (T, d).
    """
    K = knot_x.shape[0]
    seg = jnp.clip(jnp.floor(times / dt).astype(jnp.int32), 0, K - 2)
    tau = times / dt - seg.astype(times.dtype)
    x0 = knot_x[seg]
    x1 = knot_x[seg + 1]
    v0 = knot_v[seg]
    v1 = knot_v[seg + 1]
    return hermite_eval(x0, x1, v0, v1, dt, tau)


def tridiag_solve(dl, d, du, b):
    """Solve a scalar tridiagonal system via the Thomas algorithm (lax.scan).

    Args:
      dl: (N,) sub-diagonal (dl[0] unused).
      d:  (N,) diagonal.
      du: (N,) super-diagonal (du[N-1] unused).
      b:  (N, ...) right-hand side.

    Returns:
      x: (N, ...) solution.
    """
    n = d.shape[0]

    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        dli, di, dui, bi = inp
        denom = di - dli * cp_prev
        cp = dui / denom
        dp = (bi - dli * dp_prev) / denom
        return (cp, dp), (cp, dp)

    zeros_b = jnp.zeros_like(b[0])
    (_, _), (cps, dps) = jax.lax.scan(
        fwd, (jnp.zeros_like(d[0]), zeros_b), (dl, d, du, b)
    )

    def bwd(x_next, inp):
        cp, dp = inp
        x = dp - cp * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, zeros_b, (cps, dps), reverse=True)
    # last element: x[n-1] = dp[n-1] (cp[n-1]*0); scan handles via x_next=0 init
    del n
    return xs


def natural_cubic_coeffs(y: jax.Array, h):
    """Second derivatives of a natural cubic spline through uniform knots.

    Args:
      y: (N, ...) knot values at spacing ``h``.
    Returns:
      m: (N, ...) second derivatives (m[0] = m[-1] = 0).
    """
    n = y.shape[0]
    rhs = 6.0 * (y[2:] - 2.0 * y[1:-1] + y[:-2]) / (h * h)
    d = jnp.full((n - 2,), 4.0 * h / h)  # = 4 after dividing by h; keep scale simple
    dl = jnp.full((n - 2,), 1.0)
    du = jnp.full((n - 2,), 1.0)
    dl = dl.at[0].set(0.0)
    du = du.at[-1].set(0.0)
    m_inner = tridiag_solve(dl, d, du, rhs)
    pad = jnp.zeros_like(y[:1])
    return jnp.concatenate([pad, m_inner, pad], axis=0)


def natural_cubic_eval(y: jax.Array, m: jax.Array, h, x0, xq: jax.Array):
    """Evaluate the natural cubic spline defined by values ``y`` and second
    derivatives ``m`` on a uniform grid starting at ``x0`` with spacing ``h``.

    Returns (val, deriv) at query points xq (T,).
    """
    n = y.shape[0]
    t = (xq - x0) / h
    seg = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n - 2)
    u = (t - seg.astype(t.dtype))[..., None] if y.ndim > 1 else t - seg.astype(t.dtype)
    y0, y1 = y[seg], y[seg + 1]
    m0, m1 = m[seg], m[seg + 1]
    h2 = h * h
    a = y0
    b = (y1 - y0) / h - h * (2.0 * m0 + m1) / 6.0
    c = m0 / 2.0
    d = (m1 - m0) / (6.0 * h)
    du = (u * h) if y.ndim == 1 else (u * h)
    val = a + b * du + c * du * du + d * du * du * du
    deriv = b + 2.0 * c * du + 3.0 * d * du * du
    return val, deriv
