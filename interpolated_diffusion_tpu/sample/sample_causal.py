"""Alias of sample.generate_causal (reference src/sample/sample_causal.py)."""
from .generate_causal import main  # noqa: F401

if __name__ == "__main__":
    main()
