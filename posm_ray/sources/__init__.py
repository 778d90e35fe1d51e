from . import synth, boundaries  # noqa: F401
