"""mmcv.runner.force_fp32 shim.

With fp16 disabled (reference GlobalConfig carries no fp16 training
path), mmcv's decorator is a passthrough: it only casts when
``self.fp16_enabled`` is truthy, which the reference sets False
(config.py ``fp16_enabled``). We keep the runtime check for fidelity.
"""

import functools


def force_fp32(apply_to=None, out_fp16=False):
    def decorator(func):
        @functools.wraps(func)
        def wrapper(self, *args, **kwargs):
            if getattr(self, "fp16_enabled", False):
                raise NotImplementedError(
                    "ref_oracle shim: fp16 casting not implemented")
            return func(self, *args, **kwargs)
        return wrapper
    return decorator
