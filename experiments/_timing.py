"""Honest relay-safe timing — canonical copy: forge_tpu/utils/chiptime.py."""

from forge_tpu.utils.chiptime import chip_time, perturb_tree, _fetch_scalar  # noqa: F401
