"""Alias of sample.generate (reference src/sample/sample_fullseq.py:1-7)."""
from .generate import main  # noqa: F401

if __name__ == "__main__":
    main()
