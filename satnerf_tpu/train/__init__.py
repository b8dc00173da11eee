"""Training subsystem: losses, schedules, train state, fused train step,
on-device data pipeline, and the training loop."""

from satnerf_tpu.train import losses  # noqa: F401
from satnerf_tpu.train.state import TrainState, create_train_state  # noqa: F401
from satnerf_tpu.train.step import StepConfig, build_train_step  # noqa: F401
