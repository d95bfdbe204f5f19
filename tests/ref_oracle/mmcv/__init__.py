"""mmcv 1.5.3 API shim — only what reference model.py:20-22 imports."""
