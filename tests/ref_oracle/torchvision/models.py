"""Empty torchvision.models namespace (unused at runtime)."""
