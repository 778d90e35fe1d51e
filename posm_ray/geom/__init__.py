from . import kernels, index, wkb  # noqa: F401
