from .native import get_native_lib, native_available  # noqa: F401
