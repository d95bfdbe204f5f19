"""mmdet 2.25.0 API shim — only the surface reference model.py:24-30
imports. All functions replicate PUBLIC mmdet semantics (mmdet
mmdet/models/utils/gaussian_target.py, mmdet/models/losses/*) so the
real reference head runs unmodified as a parity oracle."""
