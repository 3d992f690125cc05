"""Alias of train_interp_levels (reference src/train/train_fullseq.py:1-7)."""
from .train_interp_levels import main  # noqa: F401

if __name__ == "__main__":
    main()
