"""Typed experiment configuration.

Replaces the reference's three-tier YAML/argparse merge (reference:
QTOS/utils.py:695-721 experiment name map + data/config/*.yml) with one
dataclass and named presets mirroring the reference experiments one-to-one.
"""

from qtos_tpu.config.experiments import EXPERIMENTS, ExperimentConfig, get_experiment  # noqa: F401
