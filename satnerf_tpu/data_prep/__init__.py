"""Offline dataset construction (DFC2019 adapter, cropping, meta extraction,
root.json, semantic masks) and annotation tooling."""
