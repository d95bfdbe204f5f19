"""BBoxTestMixin shim: pure mixin, no behavior used by the reference."""


class BBoxTestMixin:
    pass
