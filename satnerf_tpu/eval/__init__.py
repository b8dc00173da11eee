"""Evaluation subsystem: image metrics, semantic metrics, DSM construction +
NCC-registered altitude MAE, point-cloud export, offline eval CLIs, results
aggregation."""
