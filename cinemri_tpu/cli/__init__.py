"""CLI entry points (reference layer L4, traintest_scripts/)."""

from cinemri_tpu.cli.common import build_parser, train_test_main
from cinemri_tpu.cli.inference import InferenceRunner, zero_filled_recon

__all__ = ["build_parser", "train_test_main", "InferenceRunner", "zero_filled_recon"]
