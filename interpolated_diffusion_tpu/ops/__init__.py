from . import schedules, ddpm, keyframes, selection, clamp, normalize  # noqa: F401
