"""satnerf_tpu — TPU-native semantic NeRF framework for multi-date satellite data.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
wagnva/semantic-nerf-for-satellite-data (WACV 2025 CV4EO): NeRF / Shadow-NeRF /
SatNeRF / RS-Semantic fields over DFC2019 satellite scenes with RPC cameras,
irradiance lighting, transient-uncertainty beta, depth supervision, semantic
heads, DSM / altitude-MAE evaluation and point-cloud export.

Reference parity map lives in SURVEY.md §2; docstrings across this package cite
the reference implementation as ``ref: <file>:<line>`` so parity can be audited.
"""

__version__ = "0.1.0"
