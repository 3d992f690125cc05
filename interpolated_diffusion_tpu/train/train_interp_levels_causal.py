"""Causal Stage-2 trainer: train_interp_levels with --causal 1 forced.

Parity with reference src/train/train_interp_levels_causal.py (same trainer,
causal attention mask in the denoiser).
"""
from .train_interp_levels import build_argparser, main as _main  # noqa: F401


def main(argv=None):
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    if "--causal" not in argv:
        argv += ["--causal", "1"]
    return _main(argv)


if __name__ == "__main__":
    main()
