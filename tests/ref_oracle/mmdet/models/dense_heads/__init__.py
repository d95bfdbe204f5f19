"""mmdet.models.dense_heads shim (base classes only)."""
