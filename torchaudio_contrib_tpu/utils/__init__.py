from .compat import view_as_real, view_as_complex

__all__ = ["view_as_real", "view_as_complex"]
