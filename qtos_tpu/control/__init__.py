"""Control: 1 kHz tracking loop, trajectory buffers, receding-horizon replanning.

Replaces the reference's scripts/run.py sim loop, QTOS/combiner.py stitching,
and scripts/main.py replanning thread with jitted device-side equivalents.
"""

from qtos_tpu.control.loop import ControlParams, decode_row, playback, stance_warmup, TrackingMetrics  # noqa: F401
