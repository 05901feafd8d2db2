from .compat import view_as_real, view_as_complex
from .checkpoint import (save_params, load_params,
                         save_checkpoint, load_checkpoint)
from .timing import device_loop, time_device_loop
from .precision import cast_floats, mixed_precision

__all__ = ["view_as_real", "view_as_complex", "save_params",
           "load_params", "save_checkpoint", "load_checkpoint",
           "device_loop", "time_device_loop", "cast_floats",
           "mixed_precision"]
