"""Gait contact schedules as data.

TOWR encodes the gait in the *structure* of its per-foot spline variable sets
(35 motion / 72 force vars per foot — reference: logs/towr_log.out:101-108),
which forces one NLP shape per schedule.  Here a schedule is a pair of dense
(K, 4) arrays — contact mask and swing progress — so scenarios with different
gaits share one compiled solver.

Leg order [FL, FR, HL, HR]; default trot phase offsets [0.5, 0, 0, 0.5] from
the reference robot config (data/config/solo12.yml ``offsets`` /
``trot_2_stance_ratio``).  The default duty deliberately deviates from the
reference's 50%: 0.6 gives a walking trot whose brief four-foot overlap
phases arrest the lateral drift the pure two-foot trot integrates (measured
on the 5.6 m flat course — see `trot_schedule`), and give the stitch-row
search all-feet-in-contact rows every half period.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class GaitSchedule:
    contact: jax.Array          # (K, 4) in {0., 1.}: foot in stance at knot k
    swing_progress: jax.Array   # (K, 4) in [0, 1]: phase through current swing, 0 in stance

    @property
    def num_knots(self):
        return self.contact.shape[0]


def _swing_progress_from_phase(phase_in_cycle, duty):
    """phase_in_cycle in [0,1); swing occupies [duty, 1). Returns progress in swing."""
    in_swing = phase_in_cycle >= duty
    prog = (phase_in_cycle - duty) / jnp.maximum(1.0 - duty, 1e-6)
    return jnp.where(in_swing, jnp.clip(prog, 0.0, 1.0), 0.0)


def trot_schedule(
    K: int,
    dt: float,
    period: float = 0.5,
    duty: float = 0.6,
    offsets=(0.5, 0.0, 0.0, 0.5),
    stance_head: float = 0.2,
    stance_tail: float = 0.2,
) -> GaitSchedule:
    """Trot: diagonal pairs alternate; full stance at both window ends
    (TOWR's solo12 gaits also open/close with stance phases, which is what
    makes the receding-horizon stitch points exist — reference:
    QTOS/combiner.py:245-296 searches for all-feet-in-contact rows).

    ``duty = 0.6`` gives a walking trot: the diagonal pairs OVERLAP in a
    brief four-foot stance every half period.  Measured on the 5.6 m flat
    course (plane x4): duty 0.5 diverges 4x and never arrives (err/s 99);
    duty 0.6 arrives in 11 windows with zero divergences at err/s 47 — the
    periodic whole-support moments arrest lateral drift that the pure
    two-foot trot integrates, and they give the stitch-row search
    all-feet-in-contact rows every 0.25 s instead of only at window ends."""
    t = jnp.arange(K) * dt
    offs = jnp.asarray(offsets)
    T = (K - 1) * dt
    cyc = ((t[:, None] - stance_head) / period + offs[None, :]) % 1.0
    in_stance_cycle = cyc < duty
    head = t[:, None] <= stance_head + 1e-9
    tail = t[:, None] >= T - stance_tail - 1e-9
    contact = jnp.where(head | tail, 1.0, in_stance_cycle.astype(jnp.float32))
    prog = _swing_progress_from_phase(cyc, duty)
    prog = jnp.where(head | tail, 0.0, prog)
    return GaitSchedule(contact=contact, swing_progress=prog)


def stand_schedule(K: int) -> GaitSchedule:
    """All feet in contact (stance controller scenarios — reference:
    QTOS/robot/robot.py:527-561 default_stance_control)."""
    ones = jnp.ones((K, 4))
    return GaitSchedule(contact=ones, swing_progress=jnp.zeros((K, 4)))


def walk_schedule(K: int, dt: float, period: float = 0.8, duty: float = 0.75,
                  offsets=(0.0, 0.5, 0.75, 0.25), stance_head: float = 0.2,
                  stance_tail: float = 0.2) -> GaitSchedule:
    """Lateral-sequence walk (one foot in swing at a time)."""
    return trot_schedule(K, dt, period=period, duty=duty, offsets=offsets,
                         stance_head=stance_head, stance_tail=stance_tail)


def pace_schedule(K: int, dt: float, period: float = 0.5, duty: float = 0.55,
                  stance_head: float = 0.2, stance_tail: float = 0.2) -> GaitSchedule:
    """Pace: lateral pairs (FL+HL, FR+HR) alternate.  TOWR ships this gait
    family (its C2/pace preset); schedules being data (not variable-set
    structure) means it batches with every other gait in one compiled solver.

    Note: pace/bound plans satisfy the SRB NLP but two-foot lateral/axial
    support is dynamically marginal for SOLO12 — the PD tracking controller
    follows trot and walk plans well, pace/bound only at reduced speed.  The
    reference pins trot for the same reason (solo12.yml offsets)."""
    return trot_schedule(K, dt, period=period, duty=duty,
                         offsets=(0.5, 0.0, 0.5, 0.0),
                         stance_head=stance_head, stance_tail=stance_tail)


def bound_schedule(K: int, dt: float, period: float = 0.45, duty: float = 0.6,
                   stance_head: float = 0.2, stance_tail: float = 0.2) -> GaitSchedule:
    """Bound: front pair (FL+FR) and hind pair (HL+HR) alternate."""
    return trot_schedule(K, dt, period=period, duty=duty,
                         offsets=(0.0, 0.0, 0.5, 0.5),
                         stance_head=stance_head, stance_tail=stance_tail)


GAIT_REGISTRY = {
    "trot": trot_schedule,
    "walk": walk_schedule,
    "pace": pace_schedule,
    "bound": bound_schedule,
    "stand": lambda K, dt, **kw: stand_schedule(K),
}


def make_schedule(name: str, K: int, dt: float, **kwargs) -> GaitSchedule:
    """Config-driven gait selection (analog of TOWR's gait presets; the
    reference pins trot via solo12.yml offsets/trot_2_stance_ratio)."""
    try:
        return GAIT_REGISTRY[name](K, dt, **kwargs)
    except KeyError as e:
        raise KeyError(f"unknown gait {name!r}; known: {sorted(GAIT_REGISTRY)}") from e
