"""CLI entry points (ref: evaluate.py, train.py)."""
