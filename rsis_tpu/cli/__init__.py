"""CLI entry points mirroring the reference's train.py / eval.py surface."""
